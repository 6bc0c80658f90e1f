from .codec import (  # noqa: F401
    decode_position_lists,
    decode_postings,
    decode_varints,
    encode_position_lists,
    encode_postings,
    encode_varints,
)
