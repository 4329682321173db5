from .symbol_table import SymbolTable
from .textgrid import Entry, read_textgrid
from .tokenizer import TextTokenizer, load_pinyin_dict
