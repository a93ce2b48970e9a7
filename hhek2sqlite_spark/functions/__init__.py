from hhek2sqlite_spark.functions.scalars import (
    comma2point,
    decode_cp1252,
    empty_to_null,
    encode_cp1252,
    iso_date,
    iso_format,
    money_from_locale_string,
    money_to_locale_string,
    year_int,
)

__all__ = [
    "comma2point",
    "decode_cp1252",
    "empty_to_null",
    "encode_cp1252",
    "iso_date",
    "iso_format",
    "money_from_locale_string",
    "money_to_locale_string",
    "year_int",
]
