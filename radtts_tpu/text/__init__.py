from radtts_tpu.text.processing import TextProcessing
from radtts_tpu.text.symbols import get_symbols
