"""Channel models and LLR computation (L3)."""

from tpu_ldpc.channel.awgn import awgn_llrs, bpsk, noise_sigma2  # noqa: F401
from tpu_ldpc.channel.adapt import RateAdapt, adapted_awgn_llrs  # noqa: F401
from tpu_ldpc.channel.bsc import bsc_llr_magnitude, bsc_llrs  # noqa: F401
