"""BLS12-381 transcript — see transcript_big.py."""
from .transcript_big import TranscriptBLS12381  # noqa: F401
