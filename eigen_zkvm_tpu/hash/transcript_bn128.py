"""BN254 transcript — see transcript_big.py."""
from .transcript_big import TranscriptBN128  # noqa: F401
