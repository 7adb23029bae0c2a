"""Sweep checkpoint/resume (SURVEY.md §5 checkpoint subsystem).

The reference has no checkpointing (reruns the binary); here sweeps are
resumable by construction: sweep state = {per-SNR committed counters,
batch counter, config hash} written as JSON after every committed step.
Because PRNG keys are folded from (seed, snr_idx, batch_ctr) — not a
stream position — a resumed run is bit-identical to an uninterrupted
one (asserted in tests/test_aux.py::TestCheckpointResume).
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile


class SweepState:
    """JSON-file-backed sweep state, committed atomically per step."""

    def __init__(self, path: str, config_hash: str = ""):
        self.path = path
        self.config_hash = config_hash
        self._points: dict[int, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            if config_hash and data.get("config_hash", "") != config_hash:
                # Deliberately strict: the hash covers the FULL config
                # schema, so extending SimConfig (new defaulted fields)
                # also invalidates older checkpoints.  That is the safe
                # direction — eliding default-valued fields would let a
                # checkpoint written under an old default silently
                # resume under a changed default (same elided hash,
                # different semantics).
                raise ValueError(
                    f"checkpoint {path} was written by a different config "
                    f"({data.get('config_hash')!r} != {config_hash!r}). "
                    "If the config (or the config schema — a framework "
                    "upgrade) changed intentionally, start fresh: delete "
                    "the file or point --checkpoint elsewhere; committed "
                    "counters remain readable as JSON."
                )
            self._points = {
                int(k): v for k, v in data.get("points", {}).items()
            }

    def load_point(self, snr_idx: int):
        """Return (SnrResult, batch_ctr) for a partially-done point."""
        from tpu_ldpc.sim.mc import SnrResult

        p = self._points.get(snr_idx)
        if p is None:
            return None
        batch_ctr = p.pop("batch_ctr") if "batch_ctr" in p else 0
        res = SnrResult(**{
            k: v for k, v in p.items()
            if k in {f.name for f in dataclasses.fields(SnrResult)}
        })
        p["batch_ctr"] = batch_ctr
        return res, batch_ctr

    def save_point(self, snr_idx: int, res, batch_ctr: int):
        d = dataclasses.asdict(res)
        d["batch_ctr"] = batch_ctr
        self._points[snr_idx] = d
        self._flush()

    def _flush(self):
        data = {"config_hash": self.config_hash, "points": self._points}
        # atomic replace so a mid-write crash can't corrupt the state
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(self.path)) or ".",
            suffix=".tmp",
        )
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(data, f)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
