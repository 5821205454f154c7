from davinci_tpu.state.smt import SMT, SMTProof, SMTTransition

__all__ = ["SMT", "SMTProof", "SMTTransition"]
