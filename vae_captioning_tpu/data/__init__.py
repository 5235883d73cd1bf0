from vae_captioning_tpu.data.tokenizer import tokenize_caption  # noqa: F401
from vae_captioning_tpu.data.vocabulary import Vocabulary  # noqa: F401
from vae_captioning_tpu.data.coco import CocoCaptions  # noqa: F401
