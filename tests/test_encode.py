"""Encoder tests (SURVEY.md §4.3): both device paths vs golden."""

import numpy as np
import pytest

from tpu_ldpc.codes import LdpcCode, make_base_graph
from tpu_ldpc.encode import encode
from tpu_ldpc.golden import encode as golden_encode, syndrome_ok

CODES = [
    ("judged", lambda: LdpcCode.judged()),
    ("toy", lambda: LdpcCode.from_base_graph(make_base_graph(4, 8, 4, seed=7), 4)),
    ("wifi12", lambda: LdpcCode.from_family("wifi", "1/2", 27)),
    ("wifi56", lambda: LdpcCode.from_family("wifi", "5/6", 27)),
    ("wimax34", lambda: LdpcCode.from_family("wimax", "3/4", 24)),
]


@pytest.mark.parametrize("name,make", CODES, ids=[c[0] for c in CODES])
@pytest.mark.parametrize("method", ["generator", "dual_diagonal"])
def test_encode_matches_golden(name, make, method):
    code = make()
    rng = np.random.default_rng(hash(name) & 0xFFFF)
    u = rng.integers(0, 2, (16, code.k)).astype(np.uint8)
    c_gold = golden_encode(code.H, u)
    c_dev = np.asarray(encode(code, u, method))
    assert (c_dev == c_gold).all()
    assert syndrome_ok(code.H, c_dev).all()
    assert (c_dev[:, : code.k] == u).all()  # systematic


def test_encode_all_zero_and_all_one():
    code = LdpcCode.judged()
    z = np.zeros((1, code.k), dtype=np.uint8)
    assert not np.asarray(encode(code, z)).any()
    o = np.ones((1, code.k), dtype=np.uint8)
    c = np.asarray(encode(code, o))
    assert syndrome_ok(code.H, c).all()


def test_pivot_encoder_rank_deficient_sc_code():
    """The pivot path encodes arbitrary H — here a terminated SC-LDPC
    chain whose H is rank-deficient (true dimension exceeds design k)
    and whose trailing parity block is not invertible, so both other
    paths are unavailable."""
    import scipy.sparse as sp

    from tpu_ldpc.codes import LdpcCode, make_sc_base_graph
    from tpu_ldpc.encode.encoder import build_encoder
    from tpu_ldpc.golden import gf2_rank

    B = make_sc_base_graph(8, 8, seed=5)
    code = LdpcCode.from_base_graph(B, 8, name="sc8e")
    Hd = np.asarray(sp.csr_matrix(code.H).todense()) % 2
    rank = gf2_rank(Hd)
    assert rank < code.m  # genuinely rank-deficient

    enc = build_encoder(code, "pivot")
    assert enc.k == code.n - rank > code.k
    rng = np.random.default_rng(4)
    u = rng.integers(0, 2, (16, enc.k)).astype(np.uint8)
    c = np.asarray(enc(u))
    assert c.shape == (16, code.n)
    assert ((Hd @ c.T) % 2 == 0).all()          # valid codewords
    assert (c[:, enc.info_cols] == u).all()      # systematic in info set
    # distinct info words -> distinct codewords (injective encoding)
    assert len({bytes(row) for row in c}) == len(c)


def test_select_encoder_dispatch():
    """select_encoder: generator path for registry codes (info_cols
    None), pivot fallback for rank-deficient codes."""
    from tpu_ldpc.codes import LdpcCode, make_base_graph, make_sc_base_graph
    from tpu_ldpc.encode.encoder import select_encoder

    reg = LdpcCode.from_base_graph(make_base_graph(4, 8, 8, seed=7), 8)
    fn, k, cols = select_encoder(reg)
    assert k == reg.k and cols is None

    sc = LdpcCode.from_base_graph(make_sc_base_graph(8, 8, seed=5), 8, "sc")
    fn, k, cols = select_encoder(sc)
    assert k > sc.k and cols is not None and len(cols) == k
