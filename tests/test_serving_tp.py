"""Multi-chip continuous batching (VERDICT r1 item 1 / BASELINE config 5):
the engine over a TPModel must produce exactly the single-device engine's
tokens — cache kv-heads sharded on "tp", prefill + decode under shard_map."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.parallel import make_mesh  # noqa: E402
from autogptq_tpu.parallel.tp import TPModel  # noqa: E402
from autogptq_tpu.serving import ContinuousBatchEngine, Request  # noqa: E402


class _Model:
    def __init__(self, params, cfg, backend="xla", dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.backend = backend
        self.dtype = dtype


def _tiny(**kw):
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry_stp", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._tiny_quantized_llama(**kw)


@pytest.fixture(scope="module")
def tiny():
    return _tiny(hidden=256, inter=512, layers=2, heads=4, kv_heads=4, group_size=32)


def _requests(rng, cfg, n=3):
    return [
        Request(
            req_id=i,
            prompt=rng.integers(1, cfg.vocab_size, (int(ln),)).astype(np.int32),
            max_new_tokens=6,
        )
        for i, ln in enumerate(rng.integers(4, 12, n))
    ]


@pytest.mark.parametrize("kv_quant", [False, True])
def test_tp_engine_matches_single_device(tiny, rng, kv_quant):
    params, cfg = tiny
    reqs = _requests(rng, cfg)

    ref_engine = ContinuousBatchEngine(
        _Model(params, cfg), max_slots=2, max_seq_len=64, kv_quant=kv_quant,
    )
    ref = ref_engine.run([Request(r.req_id, r.prompt, r.max_new_tokens) for r in reqs])

    mesh = make_mesh(tp=2, devices=jax.devices()[:2])
    tpm = TPModel(params, cfg, mesh=mesh, backend="xla", dtype=jnp.float32)
    tp_engine = ContinuousBatchEngine(tpm, max_slots=2, max_seq_len=64, kv_quant=kv_quant)
    got = tp_engine.run(reqs)

    assert set(got) == set(ref)
    for rid in ref:
        np.testing.assert_array_equal(got[rid], ref[rid])


def test_tp_engine_rejects_mla():
    """TP + MLA: the latent cache has a size-1 head axis that _hspec would
    try to shard on tp — must refuse with a clear error up front."""
    from types import SimpleNamespace

    model = SimpleNamespace(
        is_tp=True, cfg=SimpleNamespace(attn_variant="mla"),
        dtype=jnp.float32,
    )
    with pytest.raises(NotImplementedError, match="MLA"):
        ContinuousBatchEngine(model, max_slots=2, max_seq_len=16)
