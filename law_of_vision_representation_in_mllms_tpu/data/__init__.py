from .conversation import Conversation, CONV_TEMPLATES, get_template
from .preprocess import (tokenizer_image_token, preprocess_sources,
                         SimpleTokenizer)
from .datasets import (SupervisedDataset, FeatureDataset, collate_batch,
                       length_grouped_indices)
