from .mms_qa import (  # noqa: F401
    MMSQAConfig,
    ConvBlock,
    V3,
    V4,
    V4_2,
    V4_WIDE,
    V5,
    mms_qa_init,
    mms_qa_apply,
    param_spec,
)
from .pair_image import (  # noqa: F401
    PairImageConfig,
    pair_image_init,
    pair_image_apply,
)
