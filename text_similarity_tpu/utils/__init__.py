from .logging import get_logger
from .lexicon import Lexicon, demo_lexicon, name_topics

__all__ = ["get_logger", "Lexicon", "demo_lexicon", "name_topics"]
