#!/bin/sh
# Build the --py-files archive for spark-submit.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/serbian_osm_lint_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('dist/serbian_osm_lint_spark.zip', 'w') as z:
    for root, _dirs, files in os.walk('serbian_osm_lint_spark'):
        if '__pycache__' in root:
            continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('wrote dist/serbian_osm_lint_spark.zip')
"
