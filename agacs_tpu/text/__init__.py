from agacs_tpu.text.tokenizer import (  # noqa: F401
    LANGUAGES,
    SpecialTokens,
    WhisperTokenizer,
    WhisperTokenIdConverter,
)
from agacs_tpu.text.cleaner import BasicTextNormalizer, TextCleaner  # noqa: F401
