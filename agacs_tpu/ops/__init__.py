from agacs_tpu.ops.logmel import (  # noqa: F401
    WhisperAudioConfig,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
)
