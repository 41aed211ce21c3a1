from agacs_tpu.adapt.cs_loss import (  # noqa: F401
    LANG_NONE,
    LANG_ZH,
    LANG_EN,
    LANG_BOTH,
    LANG_PAD,
    REFERENCE_50PCT_HEAD_MASK,
    attention_target_labels,
    cs_attention_loss,
    targets_from_labels,
)
from agacs_tpu.adapt.head_selection import (  # noqa: F401
    count_language_heads,
    select_heads,
)
