from agacs_tpu.models.whisper import (  # noqa: F401
    WhisperConfig,
    WHISPER_PRESETS,
    init_whisper_params,
    whisper_encode,
    whisper_decode,
    precompute_cross_kv,
    init_self_kv_cache,
    whisper_decode_step,
)
