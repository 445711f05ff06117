"""tssep_tpu: TPU-native target-speaker VAD / separation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
merlresearch/tssep reference (PyTorch), built TPU-first: functional models
over parameter pytrees, mesh-sharded training, matmul-DFT signal front-end,
and scan/Pallas BLSTM recurrence.
"""

__version__ = '0.1.0'
