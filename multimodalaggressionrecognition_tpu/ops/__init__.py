from .padding import pad_or_truncate
from .framing import frame_signal, framed_matmul
from .stft import spectrogram, freq_mask, time_mask
from .resample import resample_poly, resample_kernel
from .losses import (
    cross_entropy,
    weighted_cross_entropy,
    focal_loss,
    masked_head_loss,
)
from .metrics import (
    confusion_matrix,
    metrics_from_confusion,
)
