"""CLI data tools (replaces `diskann-tools`' 12 binaries):
groundtruth computation, synthetic data/label generation, subsampling,
quantizer generation.  Run: ``python -m diskann_tpu.tools <command> ...``"""
