from agacs_tpu.decode.greedy import WHISPER_CS_PRIMER, greedy_decode  # noqa: F401
from agacs_tpu.decode.beam import beam_decode  # noqa: F401
from agacs_tpu.decode.speech2text import Speech2Text  # noqa: F401
from agacs_tpu.decode.transcribe import detect_language, transcribe  # noqa: F401
from agacs_tpu.decode.timing import find_word_alignment  # noqa: F401
from agacs_tpu.decode.transducer_tsd import (  # noqa: F401
    alsd_beam_search,
    tsd_beam_search,
)
