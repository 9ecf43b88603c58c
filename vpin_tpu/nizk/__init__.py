from .sigma import (
    KnowledgeProof, EqualityProof, ProductProof,
    DotProductProof, DotProductProofLog, DotProductProofGens,
    BulletReductionProof, append_scalars_vector, dot_ints,
    commit1, commitN,
)

__all__ = [
    "KnowledgeProof", "EqualityProof", "ProductProof",
    "DotProductProof", "DotProductProofLog", "DotProductProofGens",
    "BulletReductionProof", "append_scalars_vector", "dot_ints",
    "commit1", "commitN",
]
