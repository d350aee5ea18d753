"""Pure-Python/numpy core: schema grammar, tokenizers, KDF, and the CLK
bit-level contract. No Spark imports here — this layer is shared by the
driver, executors, and tests."""

from .comparators import (
    ExactTokenizer,
    NgramTokenizer,
    NullTokenizer,
    NumericTokenizer,
    Tokenizer,
    tokenizer_from_config,
)
from .fields import (
    DateField,
    EnumField,
    Field,
    HashSpec,
    IgnoredField,
    IntegerField,
    InvalidEntryError,
    InvalidSchemaError,
    MissingValue,
    StringField,
    field_from_config,
)
from .hashing import encode_record, fold_xor
from .kdf import generate_key_lists, hkdf
from .schema import Schema, SchemaError, from_json_dict, from_json_file, from_json_str
from .serialization import (
    bits_to_bytes,
    bytes_to_bits,
    deserialize_clk,
    serialize_clk,
)
from .strategies import BitsPerFeature, BitsPerToken, Strategy, strategy_from_config
from .vectorized import BatchEncoder

__all__ = [
    "BatchEncoder",
    "BitsPerFeature",
    "BitsPerToken",
    "DateField",
    "EnumField",
    "ExactTokenizer",
    "Field",
    "HashSpec",
    "IgnoredField",
    "IntegerField",
    "InvalidEntryError",
    "InvalidSchemaError",
    "MissingValue",
    "NgramTokenizer",
    "NullTokenizer",
    "NumericTokenizer",
    "Schema",
    "SchemaError",
    "StringField",
    "Strategy",
    "Tokenizer",
    "bits_to_bytes",
    "bytes_to_bits",
    "deserialize_clk",
    "encode_record",
    "field_from_config",
    "fold_xor",
    "from_json_dict",
    "from_json_file",
    "from_json_str",
    "generate_key_lists",
    "hkdf",
    "serialize_clk",
    "strategy_from_config",
    "tokenizer_from_config",
]
