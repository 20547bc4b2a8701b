"""Reserved BERT tokens marking mention span and entity title.

Parity with reference models/params.py:1-4. In the bert-base-uncased
vocab [unused0]=id 1, [unused1]=id 2, [unused2]=id 3; tokenizers built
from other vocabs resolve the tags by name.
"""

ENT_START_TAG = "[unused0]"
ENT_END_TAG = "[unused1]"
ENT_TITLE_TAG = "[unused2]"

ENT_START_ID = 1
ENT_END_ID = 2
ENT_TITLE_ID = 3

NULL_IDX = 0  # [PAD]
