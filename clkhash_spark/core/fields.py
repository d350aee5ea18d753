"""Field specifications: per-column validation, canonicalization, and
hashing configuration.

Semantics match data61/clkhash (reference: clkhash/field_formats.py:231-876):

- Four scalar field types (``string``, ``integer``, ``date``, ``enum``)
  plus ``ignored``.
- Missing-value sentinels bypass validation and are substituted with
  ``replaceWith`` *before* tokenization.
- Integers are canonicalized by parse/re-render (``'+13'`` → ``'13'``);
  dates are re-rendered as ``%Y%m%d`` via ``datetime.strptime``/``strftime``
  (NOT Spark date functions — strftime's handling of e.g. year 123 must be
  preserved bit-for-bit).
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Any, Dict, Iterable, Optional

from .comparators import Tokenizer, tokenizer_from_config
from .strategies import Strategy, strategy_from_config


class InvalidEntryError(ValueError):
    """A data value does not conform to its field spec."""

    def __init__(self, msg: str, field: Optional["Field"] = None) -> None:
        super().__init__(msg)
        self.field = field


class InvalidSchemaError(ValueError):
    """A field specification in the schema is invalid."""


class MissingValue:
    """Sentinel detection + replacement for missing values."""

    __slots__ = ("sentinel", "replace_with")

    def __init__(self, sentinel: str, replace_with: Optional[str] = None) -> None:
        self.sentinel = sentinel
        self.replace_with = sentinel if replace_with is None else replace_with

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "MissingValue":
        return cls(config["sentinel"], config.get("replaceWith"))


class HashSpec:
    """Hashing configuration attached to a non-ignored field."""

    __slots__ = (
        "tokenizer",
        "strategy",
        "encoding",
        "hash_type",
        "prevent_singularity",
        "missing_value",
    )

    def __init__(
        self,
        tokenizer: Tokenizer,
        strategy: Strategy,
        encoding: str = "utf-8",
        hash_type: str = "blakeHash",
        prevent_singularity: Optional[bool] = None,
        missing_value: Optional[MissingValue] = None,
    ) -> None:
        if tokenizer is None:
            raise ValueError("no tokenizer specified")
        if strategy is None:
            raise ValueError("no strategy specified")
        try:
            "".encode(encoding)
        except LookupError as e:
            raise ValueError(f"{encoding!r} is not a valid encoding") from e
        if prevent_singularity is not None and hash_type != "doubleHash":
            raise ValueError(
                "prevent_singularity only applies to hash type doubleHash"
            )
        self.tokenizer = tokenizer
        self.strategy = strategy
        self.encoding = encoding
        self.hash_type = hash_type
        self.prevent_singularity = prevent_singularity
        self.missing_value = missing_value

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "HashSpec":
        hash_block = config.get("hash", {"type": "blakeHash"})
        missing = (
            MissingValue.from_config(config["missingValue"])
            if "missingValue" in config
            else None
        )
        return cls(
            tokenizer=tokenizer_from_config(config["comparison"]),
            strategy=strategy_from_config(config["strategy"]),
            hash_type=hash_block["type"],
            prevent_singularity=hash_block.get("prevent_singularity"),
            missing_value=missing,
        )


class Field:
    """Base field spec. Subclasses refine validation and formatting."""

    type_name = "base"

    def __init__(
        self,
        identifier: str,
        hash_spec: Optional[HashSpec],
        description: Optional[str] = None,
    ) -> None:
        self.identifier = identifier
        self.hash_spec = hash_spec
        self.description = description

    # -- missing values ----------------------------------------------------
    def is_missing_value(self, value: str) -> bool:
        hs = self.hash_spec
        return (
            hs is not None
            and hs.missing_value is not None
            and hs.missing_value.sentinel == value
        )

    # -- validation ---------------------------------------------------------
    def validate(self, value: str) -> None:
        """Raise :class:`InvalidEntryError` if the value is invalid."""
        if self.hash_spec is not None:
            try:
                value.encode(self.hash_spec.encoding)
            except UnicodeEncodeError as err:
                raise InvalidEntryError(
                    f"value {value!r} cannot be encoded as "
                    f"{self.hash_spec.encoding}",
                    self,
                ) from err

    # -- formatting -----------------------------------------------------------
    def format_value(self, value: str) -> str:
        """Canonicalize a value for hashing, applying missing-value rules."""
        if self.hash_spec is not None and self.is_missing_value(value):
            mv = self.hash_spec.missing_value
            assert mv is not None
            return mv.replace_with
        return self._format(value)

    def _format(self, value: str) -> str:
        return value


class StringField(Field):
    type_name = "string"

    def __init__(
        self,
        identifier: str,
        hash_spec: HashSpec,
        description: Optional[str] = None,
        pattern: Optional[str] = None,
        case: str = "mixed",
        min_length: Optional[int] = None,
        max_length: Optional[int] = None,
    ) -> None:
        super().__init__(identifier, hash_spec, description)
        if pattern is not None:
            try:
                self.regex: Optional[re.Pattern] = re.compile(pattern)
            except re.error as e:
                raise InvalidSchemaError(
                    f"invalid regular expression {pattern!r}"
                ) from e
        else:
            self.regex = None
        self.case = case
        self.min_length = min_length
        self.max_length = max_length

    def validate(self, value: str) -> None:
        if self.is_missing_value(value):
            return
        super().validate(value)
        if self.regex is not None:
            if self.regex.fullmatch(value) is None:
                raise InvalidEntryError(
                    f"value {value!r} does not match pattern "
                    f"{self.regex.pattern!r}",
                    self,
                )
            return
        n = len(value)
        if self.min_length is not None and n < self.min_length:
            raise InvalidEntryError(
                f"value {value!r} shorter than minLength {self.min_length}",
                self,
            )
        if self.max_length is not None and n > self.max_length:
            raise InvalidEntryError(
                f"value {value!r} longer than maxLength {self.max_length}",
                self,
            )
        if self.case == "upper" and value.upper() != value:
            raise InvalidEntryError(f"expected upper case, got {value!r}", self)
        if self.case == "lower" and value.lower() != value:
            raise InvalidEntryError(f"expected lower case, got {value!r}", self)
        if self.case not in ("upper", "lower", "mixed"):
            raise ValueError(f"invalid case property {self.case!r}")


class IntegerField(Field):
    type_name = "integer"

    def __init__(
        self,
        identifier: str,
        hash_spec: HashSpec,
        description: Optional[str] = None,
        minimum: Optional[int] = None,
        maximum: Optional[int] = None,
    ) -> None:
        super().__init__(identifier, hash_spec, description)
        self.minimum = minimum
        self.maximum = maximum

    def validate(self, value: str) -> None:
        if self.is_missing_value(value):
            return
        super().validate(value)
        try:
            parsed = int(value, base=10)
        except ValueError as e:
            raise InvalidEntryError(f"invalid integer {value!r}", self) from e
        if self.minimum is not None and parsed < self.minimum:
            raise InvalidEntryError(
                f"integer {parsed} below minimum {self.minimum}", self
            )
        if self.maximum is not None and parsed > self.maximum:
            raise InvalidEntryError(
                f"integer {parsed} above maximum {self.maximum}", self
            )

    def _format(self, value: str) -> str:
        # Canonical render: strips whitespace / leading '+' / leading zeros.
        try:
            return str(int(value, base=10))
        except ValueError as e:
            raise InvalidEntryError(f"invalid integer {value!r}", self) from e


class DateField(Field):
    type_name = "date"
    OUTPUT_FORMAT = "%Y%m%d"

    def __init__(
        self,
        identifier: str,
        hash_spec: HashSpec,
        format: str,
        description: Optional[str] = None,
    ) -> None:
        super().__init__(identifier, hash_spec, description)
        self.format = format

    def validate(self, value: str) -> None:
        if self.is_missing_value(value):
            return
        super().validate(value)
        try:
            datetime.strptime(value, self.format)
        except ValueError as e:
            raise InvalidEntryError(f"invalid date: {e}", self) from e

    def _format(self, value: str) -> str:
        try:
            parsed = datetime.strptime(value, self.format)
            return datetime.strftime(parsed, self.OUTPUT_FORMAT)
        except ValueError as e:
            raise InvalidEntryError(
                f"unable to format date {value!r}: {e}", self
            ) from e


class EnumField(Field):
    type_name = "enum"

    def __init__(
        self,
        identifier: str,
        hash_spec: HashSpec,
        values: Iterable[str],
        description: Optional[str] = None,
    ) -> None:
        super().__init__(identifier, hash_spec, description)
        self.values = set(values)

    def validate(self, value: str) -> None:
        if self.is_missing_value(value):
            return
        super().validate(value)
        if value not in self.values:
            raise InvalidEntryError(
                f"value {value!r} not in enum {sorted(self.values)}", self
            )


class IgnoredField(Field):
    type_name = "ignored"

    def __init__(self, identifier: Optional[str] = None) -> None:
        super().__init__(identifier or "", None)

    def validate(self, value: str) -> None:
        pass


_FIELD_TYPES = {
    "string": StringField,
    "integer": IntegerField,
    "date": DateField,
    "enum": EnumField,
}


def field_from_config(config: Dict[str, Any]) -> Field:
    """Build a :class:`Field` from one ``features[]`` JSON entry (v3 shape)."""
    if config.get("ignored", False):
        return IgnoredField(config.get("identifier"))
    try:
        identifier = config["identifier"]
        fmt = config["format"]
        type_name = fmt["type"]
    except KeyError as e:
        raise InvalidSchemaError(
            f"feature definition incomplete; missing {e}"
        ) from e
    if type_name not in _FIELD_TYPES:
        raise InvalidSchemaError(f"unknown field type {type_name!r}")
    if "hashing" not in config:
        raise InvalidSchemaError(
            f"feature {identifier!r} has no hashing block and is not ignored"
        )
    hash_spec = HashSpec.from_config(config["hashing"])
    description = fmt.get("description")

    if type_name == "string":
        if "encoding" in fmt:
            hash_spec.encoding = fmt["encoding"]
        if "pattern" in fmt:
            return StringField(
                identifier, hash_spec, description, pattern=fmt["pattern"]
            )
        return StringField(
            identifier,
            hash_spec,
            description,
            case=fmt.get("case", "mixed"),
            min_length=fmt.get("minLength"),
            max_length=fmt.get("maxLength"),
        )
    if type_name == "integer":
        return IntegerField(
            identifier,
            hash_spec,
            description,
            minimum=fmt.get("minimum"),
            maximum=fmt.get("maximum"),
        )
    if type_name == "date":
        return DateField(identifier, hash_spec, fmt["format"], description)
    if type_name == "enum":
        return EnumField(identifier, hash_spec, fmt["values"], description)
    raise InvalidSchemaError(f"unknown field type {type_name!r}")
