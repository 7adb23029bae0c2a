"""BPSK/AWGN channel and LLR computation (L3)."""

from tpu_ldpc.channel.awgn import awgn_llrs, bpsk, noise_sigma2  # noqa: F401
