"""Hub-id checkpoint resolution (VERDICT r1 item 9, reference
modeling/_utils.py:704-770) against a fake local HF cache layout, plus a
mocked push_to_hub call-contract test (reference _base.py:424-500)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from autogptq_tpu.utils import hf_io  # noqa: E402


@pytest.fixture(scope="module")
def qmodel(tmp_path_factory):
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig
    from tests.test_models import save_tiny_llama

    d = tmp_path_factory.mktemp("fp")
    save_tiny_llama(d)
    qc = BaseQuantizeConfig(bits=4, group_size=32, desc_act=False, sym=True)
    model = AutoGPTQForCausalLM.from_pretrained(
        str(d), quantize_config=qc, dtype=jnp.float32
    )
    r = np.random.default_rng(0)
    model.quantize([{"input_ids": r.integers(0, 256, size=(16,))} for _ in range(2)])
    return model


def _fake_cache(tmp_path, repo="TheBloke/tiny-GPTQ", sha="abc123def", ref="main"):
    repo_dir = tmp_path / "hub" / ("models--" + repo.replace("/", "--"))
    snap = repo_dir / "snapshots" / sha
    snap.mkdir(parents=True)
    (snap / "config.json").write_text('{"model_type": "llama"}')
    refs = repo_dir / "refs"
    refs.mkdir()
    (refs / ref).write_text(sha)
    return str(snap)


def test_local_dir_passthrough(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    assert hf_io.resolve_model_dir(str(d)) == str(d)


def test_repo_id_resolves_via_cache(tmp_path, monkeypatch):
    snap = _fake_cache(tmp_path)
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    assert hf_io.resolve_model_dir("TheBloke/tiny-GPTQ") == snap


def test_repo_id_resolves_named_revision(tmp_path, monkeypatch):
    snap = _fake_cache(tmp_path, sha="feedbeef11", ref="v2")
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    assert hf_io.resolve_model_dir("TheBloke/tiny-GPTQ", revision="v2") == snap


def test_repo_id_resolves_sha_revision(tmp_path, monkeypatch):
    snap = _fake_cache(tmp_path, sha="0123abcd")
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    assert hf_io.resolve_model_dir("TheBloke/tiny-GPTQ", revision="0123abcd") == snap


def test_missing_repo_offline_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    with pytest.raises(FileNotFoundError, match="HF_HUB_OFFLINE"):
        hf_io.resolve_model_dir("no/such-repo")


def test_hf_hub_cache_env_precedence(tmp_path, monkeypatch):
    """HF_HUB_CACHE (modern canonical var) wins over HUGGINGFACE_HUB_CACHE
    and over $HF_HOME/hub."""
    snap = _fake_cache(tmp_path)  # lays out under tmp_path/hub
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))
    monkeypatch.setenv("HUGGINGFACE_HUB_CACHE", str(tmp_path / "nonexistent"))
    monkeypatch.setenv("HF_HOME", str(tmp_path / "also-nonexistent"))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    assert hf_io.resolve_model_dir("TheBloke/tiny-GPTQ") == snap


def test_typoed_path_fails_fast_without_network(tmp_path, monkeypatch):
    """A string that is not repo-id-shaped (path separators, ./ prefix) must
    raise immediately even when online — never attempt a download."""
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    monkeypatch.delenv("HF_HUB_OFFLINE", raising=False)

    def boom(*a, **k):  # any download attempt is a bug
        raise AssertionError("snapshot_download must not be called")

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "snapshot_download", boom)
    for bad in ("./modles/llama-7b", "/no/such/dir", "a/b/c"):
        with pytest.raises(FileNotFoundError, match="repo id"):
            hf_io.resolve_model_dir(bad)


def test_from_quantized_accepts_repo_id(tmp_path, monkeypatch, qmodel):
    """End-to-end: save a tiny quantized model, lay it out as a hub cache
    snapshot, and load it back by repo id."""
    import shutil

    from autogptq_tpu.models.auto import AutoGPTQForCausalLM

    model = qmodel
    local = tmp_path / "saved"
    model.save_quantized(str(local))

    repo = "fake-org/tiny-gptq"
    snap = tmp_path / "hub" / "models--fake-org--tiny-gptq" / "snapshots" / "deadbeef"
    snap.parent.mkdir(parents=True)
    shutil.copytree(str(local), str(snap))
    refs = snap.parent.parent / "refs"
    refs.mkdir()
    (refs / "main").write_text("deadbeef")
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")

    loaded = AutoGPTQForCausalLM.from_quantized(repo, dtype=model.dtype)
    # compare against a LOCAL-dir reload (not the in-memory model: saving
    # rounds aux weights to f16, so the comparison must go through the same
    # checkpoint on both sides — this isolates the repo-id resolution path)
    ref_loaded = AutoGPTQForCausalLM.from_quantized(str(local), dtype=model.dtype)
    tokens = np.array([[3, 5, 7, 9]], np.int32)
    ref = ref_loaded.forward(tokens)
    got = loaded.forward(tokens)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_push_to_hub_call_contract(tmp_path, monkeypatch, qmodel):
    """push_to_hub is network-gated; pin its HfApi call sequence via a mock
    (VERDICT r1 weak item: unexercised code)."""
    import sys
    import types

    calls = []

    class _FakeApi:
        def __init__(self, token=None):
            calls.append(("init", token))

        def create_repo(self, repo_id, private=True, exist_ok=True):
            calls.append(("create_repo", repo_id, private, exist_ok))

        def upload_folder(self, repo_id, folder_path, commit_message):
            assert os.path.isfile(os.path.join(folder_path, "quantize_config.json"))
            assert any(
                f.endswith(".safetensors") for f in os.listdir(folder_path)
            )
            calls.append(("upload_folder", repo_id, commit_message))

    fake_mod = types.ModuleType("huggingface_hub")
    fake_mod.HfApi = _FakeApi
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake_mod)

    save_dir = tmp_path / "push"
    qmodel.save_quantized(str(save_dir))
    qmodel.push_to_hub("fake-org/tiny-gptq", save_dir=str(save_dir), token="tok")

    assert calls[0] == ("init", "tok")
    assert calls[1] == ("create_repo", "fake-org/tiny-gptq", True, True)
    assert calls[2][0:2] == ("upload_folder", "fake-org/tiny-gptq")
