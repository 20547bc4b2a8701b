from anncur_tpu.models.bert import (  # noqa: F401
    BertParams,
    BertSpec,
    bert_encode,
    init_bert_params,
)
from anncur_tpu.models.biencoder import BiEncoder  # noqa: F401
from anncur_tpu.models.crossencoder import CrossEncoder  # noqa: F401
from anncur_tpu.models.tokenizer import WordPieceTokenizer  # noqa: F401
