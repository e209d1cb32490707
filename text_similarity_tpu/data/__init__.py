from .tokenization import WordPieceTokenizer, load_tokenizer, train_wordpiece_vocab
from .batching import LengthBucketBatcher, pad_to_bucket, BUCKETS

__all__ = [
    "WordPieceTokenizer",
    "load_tokenizer",
    "train_wordpiece_vocab",
    "LengthBucketBatcher",
    "pad_to_bucket",
    "BUCKETS",
]
