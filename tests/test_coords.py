import pytest

from dream_go_tpu.utils import coords


def test_sgf_round_trip():
    for p in range(361):
        assert coords.from_sgf(coords.to_sgf(p)) == p
    assert coords.from_sgf("") == coords.PASS
    assert coords.from_sgf("tt") == coords.PASS


def test_sgf_known():
    assert coords.to_sgf(0) == "aa"            # top-left
    assert coords.to_sgf(coords.point(3, 3)) == "dd"
    assert coords.to_sgf(360) == "ss"          # bottom-right


def test_gtp_round_trip():
    for p in range(361):
        assert coords.from_gtp(coords.to_gtp(p)) == p
    assert coords.to_gtp(coords.PASS) == "pass"


def test_gtp_known():
    # A19 is top-left; T1 bottom-right; no I column
    assert coords.to_gtp(coords.point(0, 0)) == "A19"
    assert coords.to_gtp(coords.point(18, 18)) == "T1"
    assert coords.from_gtp("J10") == coords.point(8, 9)
    with pytest.raises(ValueError):
        coords.from_gtp("I5")


def test_sabaki_flips_rows():
    assert coords.to_sabaki(coords.point(0, 0)) == "as"
    assert coords.from_sabaki("as") == coords.point(0, 0)
