"""bench.py must fall back to the known-good layout if the default fails.

The driver runs bench.py unattended at round end; a Mosaic compile failure
on the (newer) default layout must degrade to ki32, not crash.
"""

import sys

import numpy as np


def test_bench_falls_back_to_known_good_layout(monkeypatch, capsys):
    sys.path.insert(0, ".")
    import bench

    calls = {"n": 0, "layouts": []}

    def fake_build_model(*a, **kw):
        calls["layouts"].append(bench.BENCH_LAYOUT)
        return {}, None

    class FakeGen:
        @staticmethod
        def generate(model, prompt, max_new_tokens):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("mosaic compile failure")
            return np.zeros((1, prompt.shape[1] + max_new_tokens), np.int32)

    monkeypatch.setattr(bench, "build_model", fake_build_model)
    monkeypatch.setattr(bench, "BENCH_LAYOUT", "kb32")
    import autogptq_tpu.utils as u

    monkeypatch.setattr(u, "generation", FakeGen, raising=False)
    monkeypatch.setattr(sys, "argv", ["bench.py", "4"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert calls["layouts"] == ["kb32", "ki32"]
    assert '"metric"' in out


def test_bench_fallback_reapplies_env_knobs(monkeypatch, capsys):
    """A fallback rebuild must re-apply the A/B env knobs (BENCH_FUSE /
    BENCH_QUANT_LMHEAD) — otherwise the unattended A/B log records a
    different configuration than requested."""
    sys.path.insert(0, ".")
    import types

    import bench

    calls = {"n": 0, "lmhead": []}

    class Cfg:
        hidden_size = 8
        vocab_size = 16

    def fake_build_model(*a, **kw):
        return {"lm_head": "dense"}, Cfg()

    def fake_dql(key, k, n, *a, **kw):
        return ("quant", k, n)

    class FakeGen:
        @staticmethod
        def generate(model, prompt, max_new_tokens):
            calls["n"] += 1
            calls["lmhead"].append(model.params["lm_head"])
            if calls["n"] == 1:
                raise RuntimeError("mosaic compile failure")
            return np.zeros((1, prompt.shape[1] + max_new_tokens), np.int32)

    monkeypatch.setenv("BENCH_QUANT_LMHEAD", "1")
    monkeypatch.setattr(bench, "build_model", fake_build_model)
    monkeypatch.setattr(bench, "device_quant_linear", fake_dql)
    monkeypatch.setattr(bench, "BENCH_LAYOUT", "kb32")
    import autogptq_tpu.utils as u

    monkeypatch.setattr(u, "generation", FakeGen, raising=False)
    monkeypatch.setattr(sys, "argv", ["bench.py", "4"])
    bench.main()
    # BOTH the primary build and the fallback rebuild applied the knob
    # (1 failed warmup + 1 fallback warmup + 2 timed runs)
    assert calls["lmhead"] == [("quant", 8, 16)] * 4
