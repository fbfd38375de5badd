"""Device memory probes — TPU analog of torch.cuda peak-memory accounting
(reference: ablation_study_fixed.py:77-84).

TPU has no ``reset_peak_memory_stats``; PJRT exposes ``memory_stats()`` with
``bytes_in_use`` / ``peak_bytes_in_use``. We track a relative peak by
snapshotting at phase boundaries, matching the reference protocol of
"peak decode memory after prefill" as closely as the platform allows.
"""
from __future__ import annotations

from typing import Optional

import jax


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    device = device or jax.local_devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return stats or {}


def bytes_in_use(device: Optional[jax.Device] = None) -> int:
    return int(device_memory_stats(device).get("bytes_in_use", 0))


def peak_bytes_in_use(device: Optional[jax.Device] = None) -> int:
    stats = device_memory_stats(device)
    return int(stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)))


def peak_memory_mb(device: Optional[jax.Device] = None) -> float:
    return peak_bytes_in_use(device) / 1024 / 1024


def tree_bytes(tree) -> int:
    """Total bytes of a pytree of arrays (params, cache, ...)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def estimate_live_mb(*trees) -> float:
    """Analytic fallback when the backend exposes no memory_stats()
    (the tunneled axon PJRT backend reports none): sum of the live pytrees'
    bytes. Reported by the ablation harness as ``peak_memory_mb`` with
    provenance noted — an *in-use lower bound*, not an allocator peak.
    """
    return sum(tree_bytes(t) for t in trees) / 1024 / 1024
