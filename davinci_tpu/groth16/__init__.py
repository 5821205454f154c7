from davinci_tpu.groth16.r1cs import ConstraintSystem, LinComb
from davinci_tpu.groth16.core import Groth16, ProvingKey, VerifyingKey, Proof

__all__ = [
    "ConstraintSystem",
    "LinComb",
    "Groth16",
    "ProvingKey",
    "VerifyingKey",
    "Proof",
]
