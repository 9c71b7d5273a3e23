"""Repo hygiene guards that don't need a Ray session."""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "bloomjoin_ray"


def test_no_pandas_imports_in_package():
    """bloomjoin_ray is pandas-free by design (Arrow/NumPy kernels only;
    VERDICT r4 #6): every batch path is zero-copy Arrow, and a pandas
    import anywhere in the package implies a hidden conversion."""
    pat = re.compile(r"^\s*(import pandas\b|from pandas\b)", re.M)
    offenders = [str(p.relative_to(PKG)) for p in sorted(PKG.rglob("*.py"))
                 if pat.search(p.read_text())]
    assert offenders == [], f"pandas imported in: {offenders}"


def test_no_ray_init_in_package():
    """Sessions are owned by the driver/bench/jobs/tests — never the
    library (CLAUDE.md invariant)."""
    pat = re.compile(r"ray\.(init|shutdown)\(")
    offenders = [str(p.relative_to(PKG)) for p in sorted(PKG.rglob("*.py"))
                 if pat.search(p.read_text())]
    assert offenders == [], f"ray.init/shutdown in: {offenders}"
