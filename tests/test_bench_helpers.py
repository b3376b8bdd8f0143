"""bench.py pure-Python helpers (no Spark): the shared sf-dir parser that
both main() and the regression guard use (ADVICE r04: the old
split('sf')[-1] broke on any path with 'sf' elsewhere in it)."""

import sys

sys.path.insert(0, "/root/repo")

from bench import _sf_from_dir


def test_sf_from_dir_parses_trailing_component():
    assert _sf_from_dir("/root/testdata/sf0.1") == "0.1"
    assert _sf_from_dir("/root/testdata/sf0.01/") == "0.01"
    assert _sf_from_dir("/root/testdata/sf10") == "10"


def test_sf_from_dir_ignores_sf_elsewhere_in_path():
    assert _sf_from_dir("/data/sfx/runs") is None
    assert _sf_from_dir("/data/sf0.1/runs") is None
    assert _sf_from_dir("/tmp/mydata") is None
