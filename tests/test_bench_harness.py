"""Unit tests for bench.py's per-query throttle-detection harness
(verdict r3 #1) — the logic that decides which readings enter the
driver-visible artifact. Probes are mocked; no Ray session needed."""

import importlib.util
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_clean_attempts_accepted(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "REPEATS", 2)
    monkeypatch.setattr(bench, "_probe_subproc", lambda: 0.8)
    calls = {"n": 0}

    def fn():
        calls["n"] += 1

    timings, probes = bench._run_probe_gated([("q", fn)])
    assert calls["n"] == 2                       # exactly REPEATS attempts
    assert len(probes["q"]) == 2
    assert all(p == 0.8 for _s, p in probes["q"])
    assert timings["q"] == min(s for s, _p in probes["q"])


def test_throttled_attempt_excluded_and_retried(monkeypatch):
    """A dirty post-probe excludes that attempt's reading from the min
    and triggers a retry; the artifact keeps the full attempt list."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "REPEATS", 2)
    # attempt-1 post-probe dirty; wait-loop probe clean; then two clean
    # attempt post-probes
    readings = iter([5.0, 0.7, 0.9, 0.8])
    monkeypatch.setattr(bench, "_probe_subproc", lambda: next(readings))

    # fn durations: throttled run is slow, clean runs fast
    durs = iter([9.0, 1.0, 1.1])
    t = {"now": 0.0}

    class FakeTime:
        @staticmethod
        def time():
            return t["now"]

        @staticmethod
        def sleep(s):
            t["now"] += s

    monkeypatch.setattr(bench, "time", FakeTime)

    def fn():
        t["now"] += next(durs)

    timings, probes = bench._run_probe_gated([("q", fn)])
    attempts = probes["q"]
    assert len(attempts) == 3
    assert attempts[0][1] == 5.0                 # dirty post-probe recorded
    # min over CLEAN readings only — the 9.0s throttled attempt is out
    assert timings["q"] == min(a[0] for a in attempts[1:])
    assert timings["q"] < 9.0


def test_never_clean_falls_back_to_min_over_all(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "REPEATS", 1)
    monkeypatch.setenv("GRAFT_QUERY_CLEAN_MAX_WAIT", "0")
    monkeypatch.setattr(bench, "_probe_subproc", lambda: 99.0)

    class FakeTime:
        _t = [0.0]

        @staticmethod
        def time():
            return FakeTime._t[0]

        @staticmethod
        def sleep(s):
            FakeTime._t[0] += s

    monkeypatch.setattr(bench, "time", FakeTime)
    durs = iter([3.0, 2.0, 2.5, 4.0])

    def fn():
        FakeTime._t[0] += next(durs)

    timings, probes = bench._run_probe_gated([("q", fn)])
    assert len(probes["q"]) == 1 + 3             # REPEATS + 3 attempt cap
    assert timings["q"] == 2.0                   # min over all attempts


def test_probes_disabled_env(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "REPEATS", 2)
    monkeypatch.setenv("GRAFT_QUERY_PROBES", "0")
    monkeypatch.setattr(bench, "_probe_subproc",
                        lambda: (_ for _ in ()).throw(AssertionError))
    timings, probes = bench._run_probe_gated([("q", lambda: None)])
    assert len(probes["q"]) == 2
    assert all(p == -1.0 for _s, p in probes["q"])
