from .trace import WitnessTrace
from .homomorphic import HomomorphicEngine, channel_sum, RLCCheckError
from .elgamal import CipherTensor, KeyPair, encrypt_batch, decrypt_batch
from .bsgs import BsgsTable
from . import fixed_point, prf

__all__ = [
    "WitnessTrace", "HomomorphicEngine", "channel_sum", "RLCCheckError",
    "CipherTensor", "KeyPair", "encrypt_batch", "decrypt_batch",
    "BsgsTable", "fixed_point", "prf",
]
