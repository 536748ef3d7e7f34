from tabata_spark.core.naming import byunits, channel_columns, get_colname, nameunit


def test_nameunit_split():
    assert nameunit("ALT[m]") == ("ALT", "m")
    assert nameunit("Vz[m/s]") == ("Vz", "m/s")
    assert nameunit("CR") == ("CR", "-")
    assert nameunit("X[") == ("X", "")


def test_byunits_groups_in_order():
    cols = ["ALT[m]", "Vz[m/s]", "TAS[m/s]", "CR"]
    g = byunits(cols)
    assert g["m"] == ["ALT[m]"]
    assert g["m/s"] == ["Vz[m/s]", "TAS[m/s]"]
    assert g["-"] == ["CR"]


def test_get_colname_contains_first_match():
    cols = ["ALT[m]", "Tisa[K]", "TAS[m/s]"]
    assert get_colname(cols, "ALT") == "ALT[m]"
    assert get_colname(cols, "TAS") == "TAS[m/s]"
    # contains (not prefix): 'isa' hits Tisa[K]
    assert get_colname(cols, "isa") == "Tisa[K]"
    # exact name wins immediately
    assert get_colname(cols, "Tisa[K]") == "Tisa[K]"
    # no match -> default (first column)
    assert get_colname(cols, "ZZZ") == "ALT[m]"
    assert get_colname(cols, None) == "ALT[m]"


def test_get_colname_raises_when_asked():
    import pytest

    with pytest.raises(ValueError):
        get_colname(["A"], "ZZZ", raise_exception=True)


def test_channel_columns_drops_struct():
    assert channel_columns(["record_id", "seq", "ts", "ALT[m]"]) == ["ALT[m]"]
