from .codec import (  # noqa: F401
    decode_postings,
    decode_varints,
    encode_postings,
    encode_varints,
)
