"""Sweep checkpoint/resume.

The reference's resume story is append-per-timestep CSVs on hardware runs
(autocorr-delta-a-single-ibm-energy.py:239-255) and post-hoc decoding of
partial job batches (SURVEY.md §5). Here: a crash-safe binary journal
(CRC-framed records, torn tails ignored — dtc_tpu.native) storing numpy
payloads keyed by config-encoded strings, so interrupted instance/trajectory
sweeps resume from the last completed unit of work.
"""

from __future__ import annotations

import io
import os

import numpy as np

from dtc_tpu import native


class SweepJournal:
    """Append-only store of named numpy arrays with crash-safe resume."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._done: dict[str, np.ndarray] = {}
        for key, blob in native.journal_read(path):
            self._done[key] = self._decode(blob)

    @staticmethod
    def _encode(arr: np.ndarray) -> bytes:
        buf = io.BytesIO()
        np.save(buf, np.asarray(arr), allow_pickle=False)
        return buf.getvalue()

    @staticmethod
    def _decode(blob: bytes) -> np.ndarray:
        return np.load(io.BytesIO(blob), allow_pickle=False)

    def __contains__(self, key: str) -> bool:
        return key in self._done

    def get(self, key: str):
        return self._done.get(key)

    def put(self, key: str, arr: np.ndarray):
        native.journal_append(self.path, key, self._encode(arr))
        self._done[key] = np.asarray(arr)

    def keys(self):
        return list(self._done)


def checkpointed_instance_sweep(journal_path, inst: int, compute_fn,
                                key_fn=lambda i: f"inst{i}"):
    """Run compute_fn(i) for each instance, skipping journaled ones;
    returns stacked results."""
    j = SweepJournal(journal_path)
    rows = []
    for i in range(inst):
        k = key_fn(i)
        if k in j:
            rows.append(j.get(k))
        else:
            r = np.asarray(compute_fn(i))
            j.put(k, r)
            rows.append(r)
    return np.stack(rows)
