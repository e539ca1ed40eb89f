from .trec_qa import (  # noqa: F401
    parse_trec_xml,
    compute_dfs,
    compute_overlap_features,
    build_vocab,
    encode_split,
    prepare_trec_qa,
    save_dataset,
    load_dataset,
    synthetic_corpus,
    synthetic_world,
    synthetic_split,
)
from .loader import ArrayDataset, BatchIterator  # noqa: F401
from .wikiqa import parse_wikiqa_tsv, prepare_wikiqa  # noqa: F401
from .pair_image import (  # noqa: F401
    PairImageDataset,
    parse_pair_list,
    synthetic_pair_corpus,
)
