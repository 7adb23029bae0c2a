"""Tests for the judge-metric producers (VERDICT r1 weak #2: bench.py
and cli/bench.py had zero coverage, and this surface broke once
in-round).  CPU smoke only: schema, one-JSON-line contract, finite
positive values.  Real-TPU numbers are the driver's job.
"""

import json
import math
import sys

import numpy as np


def _load_root_bench():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "bench.py")
    spec = importlib.util.spec_from_file_location("root_bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestRootBench:
    def test_one_json_line_schema(self, capsys):
        _load_root_bench().main()
        out = capsys.readouterr()
        lines = [ln for ln in out.out.splitlines() if ln.strip()]
        assert len(lines) == 1, f"stdout must be ONE JSON line, got {lines}"
        rec = json.loads(lines[0])
        assert rec["metric"] == "minsum50_decoded_info_bits_per_s_per_chip"
        assert rec["unit"] == "bits/s"
        assert math.isfinite(rec["value"]) and rec["value"] > 0
        assert math.isfinite(rec["vs_baseline"]) and rec["vs_baseline"] > 0
        assert abs(rec["value"] / 1e9 - rec["vs_baseline"]) < 1e-3
        # extras go to stderr as one JSON line
        err_lines = [ln for ln in out.err.splitlines()
                     if ln.startswith("{")]
        extras = json.loads(err_lines[-1])
        assert 0.0 <= extras["fer_at_2dB_full50"] <= 1.0
        assert len(extras["dec_ms"]) == len(extras["gen_ms"]) >= 3


class TestCliBench:
    def test_json_record(self, capsys):
        from tpu_ldpc.cli.bench import main

        rec = main(["--batch", "128", "--iters", "8", "--reps", "8",
                    "--json"])
        out = capsys.readouterr().out.splitlines()
        assert len(out) == 1
        assert json.loads(out[0]) == rec
        assert rec["n"] == 1024 and rec["k"] == 512
        assert math.isfinite(rec["gbps"])
        assert rec["ms_per_batch"] > 0


class TestBenchCore:
    def test_loop_timer_measures_real_work(self):
        """The paired-delta estimator must attribute more time to a
        heavier decoder (sanity that the subtraction is wired right)."""
        import jax.numpy as jnp

        from tpu_ldpc.benchcore import make_timer
        from tpu_ldpc.codes import LdpcCode
        from tpu_ldpc.decode.reference import build_decoder

        code = LdpcCode.judged()
        timer, u = make_timer(code, batch=64, inner=2)
        assert u.shape == (64, code.k)
        light = build_decoder(code, iters=2, early_stop=False)
        heavy = build_decoder(code, iters=30, early_stop=False)
        ml = timer.measure(light, reps=3)
        mh = timer.measure(heavy, reps=3)
        assert set(ml) == {"median_s", "best_s", "dec_ms", "gen_ms"}
        assert all(t > 0 for t in ml["dec_ms"] + ml["gen_ms"])
        # the 2-iter delta can go negative in estimator noise at this
        # tiny CPU workload; the 30-iter one must be solidly positive
        # and bigger
        assert mh["median_s"] > ml["median_s"]
        assert mh["median_s"] > 0
        assert ml["best_s"] <= ml["median_s"]

    def test_fresh_inputs_per_step(self):
        """Each inner step must see a different input (cache-trap
        guard): a decoder that fingerprints its input sees `inner`
        distinct values."""
        import jax.numpy as jnp

        from tpu_ldpc.benchcore import LoopTimer

        seen = []

        def probe(llr):
            # fingerprint: sum of first row (depends on the rotation)
            seen.append(None)  # trace-time marker only
            fp = jnp.sum(llr[0]).astype(jnp.int32)
            bits = jnp.zeros(llr.shape, jnp.uint8)
            ok = jnp.zeros(llr.shape[0], bool)
            return bits, ok, fp[None].repeat(llr.shape[0])

        x = np.ones((4, 256), np.float32)
        timer = LoopTimer(x, scale=1.0, sig=1.0, inner=3)
        import jax

        loop = timer._make_loop(probe)
        acc1 = int(loop(jax.random.key(1)))
        acc2 = int(loop(jax.random.key(2)))
        # different dispatch keys -> different noise -> different sums
        assert acc1 != acc2


class TestExtrasRescue:
    """bench.py's fresh-subprocess rescue for extras (r4: a mid-process
    runtime fault kills every later compile in that process — only a
    new process recovers).  Unit-level: subprocess is monkeypatched."""

    def test_missing_keys_merged_from_subprocess(self, monkeypatch):
        bench = _load_root_bench()
        payload = {k: 1.5 for k in bench.RESCUABLE}

        calls = []

        class FakeOut:
            stdout = "warning junk\n" + json.dumps(payload) + "\n"

        def fake_run(cmd, **kw):
            calls.append(cmd)
            assert "--extras-only" in cmd
            return FakeOut()

        import subprocess

        monkeypatch.setattr(subprocess, "run", fake_run)
        extras = {"layered_twophase_et_2dB_gbps_error": "boom",
                  "minsum_twophase_et_2dB_gbps": 1.4}
        bench._rescue_missing_extras(extras)
        assert len(calls) == 1  # all keys filled on the first attempt
        assert extras["layered_twophase_et_2dB_gbps"] == 1.5
        assert extras["minsum_twophase_et_2dB_gbps"] == 1.4  # not clobbered
        assert extras["extras_rescued"] == len(bench.RESCUABLE) - 1
        assert extras["layered_twophase_et_2dB_gbps_error"] == "boom"

    def test_no_subprocess_when_complete(self, monkeypatch):
        bench = _load_root_bench()

        def fake_run(cmd, **kw):
            raise AssertionError("subprocess must not run")

        import subprocess

        monkeypatch.setattr(subprocess, "run", fake_run)
        extras = {k: 2.0 for k in bench.RESCUABLE}
        bench._rescue_missing_extras(extras)
        assert "extras_rescued" not in extras

    def test_rescue_failure_recorded_and_retried(self, monkeypatch):
        bench = _load_root_bench()
        calls = []

        def fake_run(cmd, **kw):
            calls.append(cmd)
            raise RuntimeError("tunnel dead")

        import subprocess

        monkeypatch.setattr(subprocess, "run", fake_run)
        extras = {}
        bench._rescue_missing_extras(extras)
        assert len(calls) == 2  # both attempts used
        assert "tunnel dead" in extras["extras_rescue_error"]


class TestCliBenchKnobDefaults:
    def test_ebn0_defaults_to_cell_metadata(self, monkeypatch):
        """impl=twophase with no --ebn0 measures at the cell's TUNED
        operating point (r4: the old 2.0 dB default put a rate-5/6
        cell in the all-stragglers regime — 1.57 vs 4.77 Gb/s)."""
        import tpu_ldpc.cli.bench as cb

        seen = {}

        def fake_bench_decode(code, **kw):
            seen.update(kw)
            return 0.001, 1e9

        monkeypatch.setattr(cb, "bench_decode", fake_bench_decode)
        cb.main(["--family", "wimax", "--rate", "5/6", "--z", "96",
                 "--impl", "twophase", "--schedule", "layered",
                 "--iters", "25", "--json"])
        assert seen["ebn0_db"] == 3.6  # the tuned metadata point
        cb.main(["--family", "judged", "--json"])
        assert seen["ebn0_db"] == 2.0  # flooding metadata point
        cb.main(["--family", "judged", "--ebn0", "1.5", "--json"])
        assert seen["ebn0_db"] == 1.5  # explicit wins
