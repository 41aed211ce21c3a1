from agacs_tpu.eval.scoring import (  # noqa: F401
    ErrorStats,
    align_counts,
    char_tokens,
    mixed_tokens,
    read_trn,
    score_report,
    split_language,
    word_tokens,
    write_trn,
)
