"""Auxiliary subsystem tests: checkpoint/resume, reporting, config, alist
I/O, annealing, CLI plumbing (SURVEY.md §5, C13-C15)."""

import json
import os

import numpy as np
import pytest

from tpu_ldpc.codes import LdpcCode, make_base_graph
from tpu_ldpc.sim import DecodeCfg, run_ber
from tpu_ldpc.sim.state import SweepState


def toy_code():
    return LdpcCode.from_base_graph(make_base_graph(4, 8, 4, seed=7), 4, "toy")


class TestCheckpointResume:
    def test_resume_bit_identical(self, tmp_path):
        """Interrupted + resumed sweep == uninterrupted sweep (SURVEY §5)."""
        code = toy_code()
        cfg = DecodeCfg(algo="minsum", iters=15, impl="jnp")
        kw = dict(cfg=cfg, batch=32, seed=9)

        full = run_ber(code, [3.0], target_frame_errors=40,
                       max_frames=4096, **kw)[0]

        ckpt = str(tmp_path / "sweep.json")
        state = SweepState(ckpt, "h1")
        # phase 1: stop early by lowering the FE target
        run_ber(code, [3.0], target_frame_errors=10, max_frames=4096,
                state=state, **kw)
        # phase 2: fresh process (fresh SweepState) continues to the target
        state2 = SweepState(ckpt, "h1")
        resumed = run_ber(code, [3.0], target_frame_errors=40,
                          max_frames=4096, state=state2, **kw)[0]
        assert resumed.frames == full.frames
        assert resumed.bit_errors == full.bit_errors
        assert resumed.frame_errors == full.frame_errors
        assert resumed.iter_sum == full.iter_sum

    def test_config_hash_mismatch_rejected(self, tmp_path):
        ckpt = str(tmp_path / "s.json")
        s = SweepState(ckpt, "aaa")
        from tpu_ldpc.sim.mc import SnrResult

        s.save_point(0, SnrResult(ebn0_db=1.0, frames=10), 1)
        with pytest.raises(ValueError):
            SweepState(ckpt, "bbb")
        # same hash loads fine
        s2 = SweepState(ckpt, "aaa")
        res, ctr = s2.load_point(0)
        assert res.frames == 10 and ctr == 1


class TestReport:
    def test_waterfall_outputs(self):
        from tpu_ldpc.report.waterfall import (
            load_csv, waterfall_csv, waterfall_table, wilson_interval,
        )
        from tpu_ldpc.sim.mc import SnrResult

        rs = [
            SnrResult(ebn0_db=1.0, frames=1000, bit_errors=500,
                      frame_errors=100, iter_sum=30000, bits=16000),
            SnrResult(ebn0_db=2.0, frames=5000, bit_errors=50,
                      frame_errors=10, iter_sum=50000, bits=80000),
        ]
        table = waterfall_table(rs)
        assert "1.00" in table and "2.00" in table
        rows = load_csv(waterfall_csv(rs))
        assert rows[0]["fer"] == pytest.approx(0.1)
        assert rows[1]["frames"] == 5000
        lo, hi = wilson_interval(100, 1000)
        assert lo < 0.1 < hi
        assert wilson_interval(0, 0) == (0.0, 1.0)


class TestConfig:
    def test_from_sources_and_hash(self, tmp_path):
        from tpu_ldpc.cli.config import SimConfig

        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({
            "decode": {"algo": "sumproduct", "iters": 25},
            "channel": {"ebn0_grid": [1.0, 2.0]},
        }))
        cfg = SimConfig.from_sources(str(p), ["decode.alpha=0.9",
                                              "run.batch=512"])
        assert cfg.decode.algo == "sumproduct"
        assert cfg.decode.iters == 25
        assert cfg.decode.alpha == 0.9
        assert cfg.run.batch == 512
        assert cfg.channel.ebn0_grid == (1.0, 2.0)
        h1 = cfg.config_hash()
        h2 = SimConfig.from_sources(str(p), ["decode.alpha=0.9",
                                             "run.batch=512"]).config_hash()
        assert h1 == h2
        assert SimConfig().config_hash() != h1

    def test_unknown_key_rejected(self):
        from tpu_ldpc.cli.config import SimConfig

        with pytest.raises(ValueError):
            SimConfig.from_sources(None, ["decode.bogus=1"])


class TestAlist:
    def test_shift_table_roundtrip(self, tmp_path):
        from tpu_ldpc.codes.alist import load_shift_table, save_shift_table

        code = toy_code()
        p = str(tmp_path / "code.qc")
        save_shift_table(code, p)
        code2 = load_shift_table(p)
        assert np.array_equal(code.B, code2.B)
        assert code.Z == code2.Z

    def test_alist_roundtrip_qc_detect(self, tmp_path):
        from tpu_ldpc.codes.alist import load_alist, save_alist

        code = toy_code()
        p = str(tmp_path / "code.alist")
        save_alist(code.H, p)
        code2 = load_alist(p)  # auto-detect Z
        assert (np.asarray(code2.H.todense())
                == np.asarray(code.H.todense())).all()

    def test_alist_matrix_roundtrip(self, tmp_path):
        from tpu_ldpc.codes.alist import load_alist_matrix, save_alist

        code = LdpcCode.judged()
        p = str(tmp_path / "j.alist")
        save_alist(code.H, p)
        H2 = load_alist_matrix(p)
        assert (H2 != code.H).nnz == 0


class TestAnneal:
    def test_anneal_removes_cycles(self):
        from tpu_ldpc.codes import count_4cycles
        from tpu_ldpc.codes.anneal import anneal_shifts

        rng = np.random.default_rng(0)
        # deliberately bad shifts: all zero -> many 4-cycles
        B = make_base_graph(4, 8, 8, seed=3).copy()
        kb = 4
        B[:, :kb][B[:, :kb] >= 0] = 0
        z0 = count_4cycles(B, 8)
        assert z0 > 0
        B2, stats = anneal_shifts(B, 8, steps=400, seed=1)
        assert stats["c4"] < z0
        # parity part untouched
        assert np.array_equal(B2[:, kb:], B[:, kb:])


class TestCli:
    def test_sim_cli_end_to_end(self, tmp_path, capsys):
        from tpu_ldpc.cli.sim import main

        csv = str(tmp_path / "out.csv")
        results = main([
            "--family", "judged", "--ebn0", "3.0", "--algo", "minsum",
            "--iters", "10", "--impl", "jnp", "--batch", "64",
            "--target-fe", "5", "--max-frames", "256", "--csv", csv,
            "--jsonl", str(tmp_path / "pts.jsonl"),
        ])
        out = capsys.readouterr().out
        assert "qc1024_r12" in out
        assert os.path.exists(csv)
        rec = json.loads(
            open(tmp_path / "pts.jsonl").read().strip().splitlines()[-1]
        )
        assert rec["frames"] == results[0].frames

    def test_codegen_cli(self, tmp_path, capsys):
        from tpu_ldpc.cli.codegen import main

        out = str(tmp_path / "c.qc")
        main(["--family", "custom", "--mb", "4", "--nb", "8", "--z", "8",
              "--out", out])
        assert "girth>=" in capsys.readouterr().out
        from tpu_ldpc.codes.alist import load_shift_table

        code = load_shift_table(out)
        assert code.n == 64

    def test_codegen_cli_pexit_threshold(self, tmp_path, capsys):
        from tpu_ldpc.cli.codegen import main

        out = str(tmp_path / "p.qc")
        main(["--family", "custom", "--mb", "3", "--nb", "6", "--z", "8",
              "--pexit", "15", "--anneal", "50", "--ace", "--threshold",
              "--out", out])
        text = capsys.readouterr().out
        assert "pexit search: threshold" in text
        assert "PEXIT BP-threshold estimate" in text
        from tpu_ldpc.codes.alist import load_shift_table

        assert load_shift_table(out).n == 48


class TestObservability:
    def test_step_jsonl_written(self, tmp_path):
        code = toy_code()
        cfg = DecodeCfg(algo="minsum", iters=10, impl="jnp")
        log = str(tmp_path / "steps.jsonl")
        run_ber(code, [4.0], cfg=cfg, batch=16, target_frame_errors=3,
                max_frames=128, seed=2, step_log=log)
        recs = [json.loads(ln) for ln in open(log)]
        assert len(recs) >= 1
        assert recs[-1]["frames"] >= recs[0]["frames"]
        assert "info_bits_per_s" in recs[0]

    def test_plot_waterfall(self, tmp_path):
        from tpu_ldpc.report.plots import plot_waterfall
        from tpu_ldpc.sim.mc import SnrResult

        rs = [SnrResult(ebn0_db=1.0, frames=100, frame_errors=50,
                        bit_errors=300, bits=1600),
              SnrResult(ebn0_db=2.0, frames=100, frame_errors=5,
                        bit_errors=20, bits=1600)]
        out = plot_waterfall({"toy": rs}, str(tmp_path / "w.png"))
        if out is not None:  # matplotlib optional
            import os

            assert os.path.getsize(out) > 0


def test_find_ebn0_at_fer():
    """Bisection finds a bracketed waterfall crossing (deterministic
    given the seed); out-of-range targets are flagged."""
    from tpu_ldpc.codes import LdpcCode, make_base_graph
    from tpu_ldpc.sim import DecodeCfg, find_ebn0_at_fer, run_ber

    code = LdpcCode.from_base_graph(make_base_graph(4, 8, 4, seed=7), 4, "toy")
    cfg = DecodeCfg(algo="minsum", iters=20, impl="jnp")
    kw = dict(cfg=cfg, batch=128, target_frame_errors=40, seed=3)
    sr = find_ebn0_at_fer(code, 0.05, lo=1.0, hi=9.0, tol_db=0.25,
                          max_frames=4096, **kw)
    assert sr.converged
    lo, hi = sr.bracket
    assert 1.0 <= lo <= sr.ebn0_db <= hi <= 9.0 and hi - lo <= 0.25
    # the bracket really straddles the target (re-measure endpoints)
    f_lo = run_ber(code, [lo], max_frames=4096, **kw)[0].fer
    f_hi = run_ber(code, [hi], max_frames=4096, **kw)[0].fer
    assert f_lo >= 0.05 >= f_hi
    # target below reach of the range -> not converged
    sr2 = find_ebn0_at_fer(code, 1e-9, lo=1.0, hi=2.0, tol_db=0.5,
                           max_frames=512, **kw)
    assert not sr2.converged
