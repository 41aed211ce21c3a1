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
from agacs_tpu.models.transducer import (  # noqa: F401
    TransducerConfig,
    default_beam_search,
    greedy_search,
    greedy_search_scan,
    init_transducer_params,
    joint,
    joint_lattice,
    transducer_decoder,
    transducer_decoder_step,
)
from agacs_tpu.models.transducer_asr import (  # noqa: F401
    TransducerASRConfig,
    init_transducer_asr_params,
)
