from tssep_tpu.signal.stft import STFT  # noqa: F401
from tssep_tpu.signal.intervals import ArrayInterval  # noqa: F401
from tssep_tpu.signal.vad import stft_vad, istft_vad  # noqa: F401
