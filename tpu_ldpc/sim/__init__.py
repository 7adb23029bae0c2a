"""Monte-Carlo BER/FER harness (L3)."""

from tpu_ldpc.sim.mc import DecodeCfg, SnrResult, build_mc_step, fold_key, run_ber  # noqa: F401
from tpu_ldpc.sim.search import FerSearchResult, find_ebn0_at_fer  # noqa: F401
