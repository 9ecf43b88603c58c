from .keccak import keccak_f1600, sha3_256
from .strobe import Strobe128
from .merlin import Transcript, RandomTape

__all__ = ["keccak_f1600", "sha3_256", "Strobe128", "Transcript", "RandomTape"]
