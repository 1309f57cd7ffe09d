# -*- coding: utf-8 -*-
"""Reference unit tests ported verbatim as DataFrame assertions.

Every permutation from /root/reference/test/test_checks.py:22-174 and
test_applicability.py:12-30 is encoded as a doc row; assertions are
error-vs-no-error per (doc, map, check), exactly like the reference's
assertTrue(do_check(...) != '').

The reference sets a tag to None to mean "present but None"; our span
encoding has no None values (absent span ≡ absent tag), which collapses
the reference's {absent, None} cases into one — both produce the same
verdict in every reference test, so parity holds.
"""

import pytest

from conftest import make_docs

SERBIA = "Serbia checks (synth)"
OTHER = "Atlantida checks (synth)"


@pytest.fixture(scope="module")
def verdicts(spark, empty_dims):
    from serbian_osm_lint_spark.operators.checks import lint_verdicts_df

    rows = [
        # --- NameMissingCheck (test_checks.py:22-34)
        ("nm_absent", {"place": "city"}, None),
        ("nm_empty", {"place": "city", "name": ""}, None),
        ("nm_ok", {"place": "city", "name": "foo"}, None),
        # --- NameCyrillicCheck serbia (test_checks.py:41-54)
        ("nc_absent", {"place": "city"}, None),
        ("nc_empty", {"place": "city", "name": ""}, None),
        ("nc_latin", {"place": "city", "name": "foo"}, None),
        ("nc_cyr", {"place": "city", "name": "фоо"}, None),
        # other-country branch uses name:sr
        ("nc_sr_latin", {"place": "city", "name:sr": "foo"}, None),
        ("nc_sr_cyr", {"place": "city", "name:sr": "фоо"}, None),
        # --- LatinNameExistsCheck (test_checks.py:78-132)
        ("ln_absent", {"place": "city", "name": "фоо"}, None),
        ("ln_empty", {"place": "city", "name": "фоо", "name:sr-Latn": ""}, None),
        ("ln_ok", {"place": "city", "name": "фоо", "name:sr-Latn": "foo"}, None),
        ("ln_cyr", {"place": "city", "name": "фоо", "name:sr-Latn": "фоо"}, None),
        # other-country: no name:sr -> no error; with name:sr -> error
        ("ln_nosr", {"place": "city", "name": "фоо"}, None),
        ("ln_sr", {"place": "city", "name:sr": "фоо"}, None),
        ("ln_sr_ok", {"place": "city", "name:sr": "фоо", "name:sr-Latn": "foo"}, None),
        # --- LatinNameSameAsCyrillicCheck (test_checks.py:139-155)
        ("ls_ok", {"place": "city", "name": "фоо", "name:sr-Latn": "foo"}, None),
        ("ls_bad", {"place": "city", "name": "фоо", "name:sr-Latn": "foo2"}, None),
        ("ls_sr_ok", {"place": "city", "name:sr": "фоо", "name:sr-Latn": "foo"}, None),
        ("ls_sr_bad", {"place": "city", "name:sr": "фоо", "name:sr-Latn": "foo2"}, None),
        # --- LatinNameNotInCyrillicCheck (test_checks.py:162-174)
        ("lnc_noln", {"place": "city", "name": "бар"}, None),
        ("lnc_empty", {"place": "city", "name": "бар", "name:sr-Latn": ""}, None),
        ("lnc_lat", {"place": "city", "name": "бар", "name:sr-Latn": "foo"}, None),
        ("lnc_cyr", {"place": "city", "name": "бар", "name:sr-Latn": "фоо"}, None),
        ("lnc_noname", {"place": "city", "name:sr-Latn": "фоо"}, None),
        # --- applicability (test_applicability.py:12-30)
        ("ap_town", {"place": "town"}, None),
        ("ap_village", {"place": "village"}, None),
        ("ap_city_case", {"place": "CiTy", "name": "foo"}, None),
        ("ap_noplace", {"name": "foo"}, None),
        ("ap_other", {"place": "suburb", "name": "foo"}, None),
        # --- country exclusion (src/checks.py:220-221)
        ("ex_monte", {"place": "city", "name": "foo", "is_in:country": "Montenegro"}, None),
        ("ex_serbia", {"place": "city", "name": "foo", "is_in:country": "Serbia"}, None),
    ]
    docs = make_docs(spark, rows)
    wiki, wd = empty_dims
    v = lint_verdicts_df(spark, docs, wiki, wd)
    out = {}
    for r in v.collect():
        out[(r.doc_id, r.map_name, r.check_name.split(".")[-1])] = (
            r.result == "CHECKED_ERROR"
        )
    return out


def err(verdicts, doc, check, map_name=SERBIA):
    key = (doc, map_name, check)
    assert key in verdicts, f"missing verdict {key}"
    return verdicts[key]


def test_name_missing(verdicts):
    assert err(verdicts, "nm_absent", "NameMissingCheck")
    assert err(verdicts, "nm_empty", "NameMissingCheck")
    assert not err(verdicts, "nm_ok", "NameMissingCheck")


def test_name_cyrillic_serbia(verdicts):
    assert not err(verdicts, "nc_absent", "NameCyrillicCheck")
    assert not err(verdicts, "nc_empty", "NameCyrillicCheck")
    assert err(verdicts, "nc_latin", "NameCyrillicCheck")
    assert not err(verdicts, "nc_cyr", "NameCyrillicCheck")


def test_name_cyrillic_other_country(verdicts):
    assert not err(verdicts, "nc_latin", "NameCyrillicCheck", OTHER)  # no name:sr
    assert err(verdicts, "nc_sr_latin", "NameCyrillicCheck", OTHER)
    assert not err(verdicts, "nc_sr_cyr", "NameCyrillicCheck", OTHER)


def test_latin_name_exists_serbia(verdicts):
    assert err(verdicts, "ln_absent", "LatinNameExistsCheck")
    assert err(verdicts, "ln_empty", "LatinNameExistsCheck")
    assert not err(verdicts, "ln_ok", "LatinNameExistsCheck")
    # cyrillic value still counts as "exists" (test_checks.py:130-132)
    assert not err(verdicts, "ln_cyr", "LatinNameExistsCheck")


def test_latin_name_exists_other_country(verdicts):
    assert not err(verdicts, "ln_nosr", "LatinNameExistsCheck", OTHER)
    assert err(verdicts, "ln_sr", "LatinNameExistsCheck", OTHER)
    assert not err(verdicts, "ln_sr_ok", "LatinNameExistsCheck", OTHER)


def test_latin_same_as_cyrillic(verdicts):
    assert not err(verdicts, "ls_ok", "LatinNameSameAsCyrillicCheck")
    assert err(verdicts, "ls_bad", "LatinNameSameAsCyrillicCheck")
    assert not err(verdicts, "ls_sr_ok", "LatinNameSameAsCyrillicCheck", OTHER)
    assert err(verdicts, "ls_sr_bad", "LatinNameSameAsCyrillicCheck", OTHER)


def test_latin_not_in_cyrillic(verdicts):
    assert not err(verdicts, "lnc_noln", "LatinNameNotInCyrillicCheck")
    assert not err(verdicts, "lnc_empty", "LatinNameNotInCyrillicCheck")
    assert not err(verdicts, "lnc_lat", "LatinNameNotInCyrillicCheck")
    assert err(verdicts, "lnc_cyr", "LatinNameNotInCyrillicCheck")
    # no 'name' tag -> OK even with cyrillic latin value (test_checks.py:172-174)
    assert not err(verdicts, "lnc_noname", "LatinNameNotInCyrillicCheck")


def test_applicability(verdicts):
    # town/village applicable; CiTy (case), no-place, suburb not
    assert ("ap_town", SERBIA, "NameMissingCheck") in {
        (d, m, c) for (d, m, c) in verdicts
    }
    for doc in ("ap_city_case", "ap_noplace", "ap_other"):
        assert not any(k[0] == doc for k in verdicts), doc


def test_country_exclusion(verdicts):
    # Montenegro: NameCyrillic skips; Serbia: checked
    assert not err(verdicts, "ex_monte", "NameCyrillicCheck")
    assert err(verdicts, "ex_serbia", "NameCyrillicCheck")
    # IsInCountryCheck: present -> OK either way; absent -> error
    assert not err(verdicts, "ex_monte", "IsInCountryCheck")
    assert err(verdicts, "nm_ok", "IsInCountryCheck")
