"""HF checkpoint I/O: read/write safetensors (sharded or single-file).

Reference counterparts: `get_checkpoints` sharded-index resolution
(modeling/_utils.py:704-770), the vendored accelerate loader
(utils/accelerate_utils.py:28), and `save_quantized`'s safetensors-with-
metadata writer (modeling/_base.py:502-577). Here everything is NumPy-based
(no torch dependency on the load path; torch .bin checkpoints are supported
if torch is importable).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np

SAFE_INDEX = "model.safetensors.index.json"
WEIGHT_INDEX = "pytorch_model.bin.index.json"


def _upcast_bf16(t: np.ndarray) -> np.ndarray:
    """safetensors>=0.8 returns ml_dtypes bfloat16 under framework="np";
    upcast to float32 so downstream NumPy code sees a native dtype."""
    if t.dtype != np.float32 and "bfloat16" in str(t.dtype):
        return t.astype(np.float32)
    return t


def resolve_model_dir(name_or_path: str, revision: str | None = None) -> str:
    """Resolve a model reference to a local directory.

    The reference's ``from_quantized`` accepts local dirs AND HF Hub repo ids
    with revisions (modeling/_utils.py:704-770, _base.py:854). Resolution
    order here:

      1. an existing local directory is returned as-is;
      2. a ``org/name``-shaped id is looked up in the local HF hub cache
         (``$HF_HOME/hub/models--org--name/snapshots/<sha>``, revision
         resolved through ``refs/<revision>``) — works fully offline;
      3. otherwise ``huggingface_hub.snapshot_download`` is attempted unless
         ``HF_HUB_OFFLINE`` is set (air-gapped deployments stop at 2).
    """
    if os.path.isdir(name_or_path):
        return name_or_path

    rev = revision or "main"
    hf_home = os.environ.get("HF_HOME") or os.path.join(
        os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")),
        "huggingface",
    )
    # HF_HUB_CACHE is the modern canonical env var; HUGGINGFACE_HUB_CACHE is
    # its legacy alias (huggingface_hub gives the former precedence).
    hub = (
        os.environ.get("HF_HUB_CACHE")
        or os.environ.get("HUGGINGFACE_HUB_CACHE")
        or os.path.join(hf_home, "hub")
    )
    repo_dir = os.path.join(hub, "models--" + name_or_path.replace("/", "--"))
    snapshots = os.path.join(repo_dir, "snapshots")
    if os.path.isdir(snapshots):
        ref_file = os.path.join(repo_dir, "refs", rev)
        if os.path.isfile(ref_file):
            with open(ref_file) as f:
                sha = f.read().strip()
            snap = os.path.join(snapshots, sha)
            if os.path.isdir(snap):
                return snap
        if os.path.isdir(os.path.join(snapshots, rev)):  # rev given as a sha
            return os.path.join(snapshots, rev)
        # single cached snapshot, no refs metadata
        subs = sorted(os.listdir(snapshots))
        if len(subs) == 1 and revision is None:
            return os.path.join(snapshots, subs[0])

    # Only strings shaped like a Hub repo id ("name" or "org/name", no path
    # prefixes) may reach the network: a typo'd local path must fail fast
    # instead of hanging on a download attempt on air-gapped hosts.
    import re

    repo_id_like = re.fullmatch(r"[\w.\-]+(/[\w.\-]+)?", name_or_path) is not None
    if not repo_id_like:
        raise FileNotFoundError(
            f"{name_or_path!r} is not an existing local directory and does "
            "not look like a HF Hub repo id"
        )
    # huggingface_hub truthiness convention: "0"/""/"false" mean ONLINE
    offline = os.environ.get("HF_HUB_OFFLINE", "").upper() in (
        "1", "ON", "YES", "TRUE",
    )
    if not offline:
        try:
            from huggingface_hub import snapshot_download

            return snapshot_download(name_or_path, revision=revision)
        except Exception as e:  # noqa: BLE001 — surface a unified error below
            raise FileNotFoundError(
                f"{name_or_path!r} is not a local directory, not in the HF "
                f"cache at {hub}, and downloading failed: {e}"
            ) from e
    raise FileNotFoundError(
        f"{name_or_path!r} is not a local directory and not in the HF cache "
        f"at {hub} (HF_HUB_OFFLINE is set, so no download was attempted)"
    )


def find_checkpoint_files(model_dir: str, basename: str | None = None) -> list[str]:
    """Resolve checkpoint file(s) in a local dir: single safetensors, sharded
    safetensors via index.json, or torch .bin (single/sharded)."""
    candidates = []
    if basename:
        for ext in (".safetensors", ".bin", ".pt"):
            p = os.path.join(model_dir, basename + ext)
            if os.path.isfile(p):
                return [p]
        idx = os.path.join(model_dir, f"{basename}.safetensors.index.json")
        if os.path.isfile(idx):
            with open(idx) as f:
                files = sorted(set(json.load(f)["weight_map"].values()))
            return [os.path.join(model_dir, f) for f in files]
    idx = os.path.join(model_dir, SAFE_INDEX)
    if os.path.isfile(idx):
        with open(idx) as f:
            files = sorted(set(json.load(f)["weight_map"].values()))
        return [os.path.join(model_dir, f) for f in files]
    for name in ("model.safetensors",):
        p = os.path.join(model_dir, name)
        if os.path.isfile(p):
            return [p]
    # any *.safetensors
    st = sorted(
        os.path.join(model_dir, f)
        for f in os.listdir(model_dir)
        if f.endswith(".safetensors")
    )
    if st:
        return st
    idx = os.path.join(model_dir, WEIGHT_INDEX)
    if os.path.isfile(idx):
        with open(idx) as f:
            files = sorted(set(json.load(f)["weight_map"].values()))
        return [os.path.join(model_dir, f) for f in files]
    for name in ("pytorch_model.bin",):
        p = os.path.join(model_dir, name)
        if os.path.isfile(p):
            return [p]
    candidates = sorted(
        os.path.join(model_dir, f)
        for f in os.listdir(model_dir)
        if f.endswith(".bin")
    )
    if candidates:
        return candidates
    raise FileNotFoundError(f"no model checkpoint found in {model_dir}")


def iter_tensors(files: list[str]) -> Iterator[tuple[str, np.ndarray]]:
    """Stream (name, np array) pairs from checkpoint files. bfloat16 tensors
    are upcast to float32 (NumPy has no native bf16)."""
    for path in files:
        if path.endswith(".safetensors"):
            yield from _iter_safetensors(path)
        else:
            yield from _iter_torch_bin(path)


def _iter_safetensors(path: str) -> Iterator[tuple[str, np.ndarray]]:
    from safetensors import safe_open

    with safe_open(path, framework="np") as f:
        for name in f.keys():
            yield name, _upcast_bf16(f.get_tensor(name))


def _iter_torch_bin(path: str) -> Iterator[tuple[str, np.ndarray]]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    for name, t in sd.items():
        if t.dtype == torch.bfloat16:
            t = t.float()
        yield name, t.numpy()


def load_tensors(model_dir: str, basename: str | None = None) -> dict[str, np.ndarray]:
    return dict(iter_tensors(find_checkpoint_files(model_dir, basename)))


class LazyTensors:
    """Dict-like view over checkpoint files that materializes tensors on
    access (safetensors are mmap-backed, so host RSS stays at roughly one
    tensor at a time instead of the whole checkpoint — the analog of the
    reference's low_cpu_mem_usage/accelerate staging, modeling/_base.py:893-
    900 + utils/accelerate_utils.py). A 70B fp16 checkpoint (140GB) loads on
    this 125GB host only through this path."""

    def __init__(self, files: list[str]):
        from safetensors import safe_open

        self._handles = []
        self._index: dict[str, int] = {}
        self._eager: dict[str, np.ndarray] = {}
        for path in files:
            if path.endswith(".safetensors"):
                h = safe_open(path, framework="np")
                hi = len(self._handles)
                self._handles.append((path, h))
                for name in h.keys():
                    self._index[name] = hi
            else:  # torch .bin cannot be partially loaded: eager fallback
                self._eager.update(dict(_iter_torch_bin(path)))

    def __contains__(self, name: str) -> bool:
        return name in self._index or name in self._eager

    def keys(self):
        return list(self._index) + list(self._eager)

    def __iter__(self):
        return iter(self.keys())

    def __getitem__(self, name: str) -> np.ndarray:
        if name in self._eager:
            return self._eager[name]
        path, h = self._handles[self._index[name]]
        return _upcast_bf16(h.get_tensor(name))

    def get(self, name: str, default=None):
        return self[name] if name in self else default


def open_tensors(model_dir: str, basename: str | None = None):
    """Lazy when possible (safetensors), eager dict otherwise."""
    files = find_checkpoint_files(model_dir, basename)
    return LazyTensors(files)


def save_safetensors(
    tensors: dict[str, np.ndarray],
    path: str,
    metadata: dict[str, str] | None = None,
    max_shard_size: int | None = None,
) -> None:
    """Write tensors to safetensors; shard with an index.json when
    ``max_shard_size`` (bytes) is given and exceeded."""
    from safetensors.numpy import save_file

    # save_file serializes the raw buffer: a non-contiguous array (e.g. a
    # transposed kernel) would be silently written in memory order, i.e.
    # corrupted. Force C-contiguity for every tensor.
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if max_shard_size is None or sum(t.nbytes for t in tensors.values()) <= max_shard_size:
        save_file(tensors, path, metadata=metadata)
        return

    # Shard
    shards: list[dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for name, t in tensors.items():
        if sizes[-1] + t.nbytes > max_shard_size and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][name] = t
        sizes[-1] += t.nbytes
    base = os.path.basename(path).replace(".safetensors", "")
    dirname = os.path.dirname(path) or "."
    weight_map = {}
    n = len(shards)
    for i, shard in enumerate(shards):
        fname = f"{base}-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(dirname, fname), metadata=metadata)
        for name in shard:
            weight_map[name] = fname
    index = {
        "metadata": {"total_size": sum(t.nbytes for t in tensors.values())},
        "weight_map": weight_map,
    }
    # Name the index after the target basename so the reference's
    # get_checkpoints (modeling/_utils.py:715) — which probes
    # "{model_basename}.safetensors.index.json" — can discover sharded saves.
    with open(os.path.join(dirname, f"{base}.safetensors.index.json"), "w") as f:
        json.dump(index, f, indent=2)


def load_hf_config(model_dir: str) -> dict:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


__all__ = [
    "find_checkpoint_files",
    "iter_tensors",
    "load_tensors",
    "save_safetensors",
    "load_hf_config",
]
