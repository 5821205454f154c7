"""Smoke: toy 2-chain outer Groth16 proof verified in-circuit over BN254
via Groth16VerifierGadgetBW6 (the c4 aggregator-verification shape,
reference circuits/statetransition VerifyAggregatorProof:240) with the
log-derivative lookup range-check tier.  Prints constraint counts."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from davinci_tpu import fields as F
from davinci_tpu.circuits.lookup import LookupRangeChecker
from davinci_tpu.circuits.pairing_gadget6 import Groth16VerifierGadgetBW6
from davinci_tpu.circuits.toycurve import toy_2chain, toy_2chain_groth16
from davinci_tpu.groth16 import ConstraintSystem

m = int(sys.argv[1]) if len(sys.argv) > 1 else 13

t0 = time.time()
t = toy_2chain(m)
print(f"[{time.time()-t0:7.1f}s] toy 2-chain m={m}: r={t['ctx6'].r.bit_length()}b q={t['q'].bit_length()}b")

inner, outer = toy_2chain_groth16(m)
r = t["ctx6"].r
cs = ConstraintSystem(r)
y_v = (3**3 + 3 + 5) % r
y = cs.pub_input(y_v)
x = cs.priv_input(3)
cs.assert_eq(cs.mul(cs.mul(x, x), x) + x + 5, y)
pk, vk = outer.setup(cs)
proof = outer.prove(pk, cs, r_rand=7, s_rand=11)
assert outer.verify(vk, proof, [y_v])
print(f"[{time.time()-t0:7.1f}s] outer Groth16 proof ok")

cs4 = ConstraintSystem(F.BN254_R)
rc = LookupRangeChecker(cs4, table_bits=12)
gadget = Groth16VerifierGadgetBW6(cs4, vk, ctx=t["ctx6"], range_checker=rc)
yb = [cs4.to_bits(cs4.priv_input(y_v), r.bit_length())]
pv = gadget.alloc_proof(proof)
gadget.assert_valid(pv, yb)
rc.finalize(0x1CEB00DA12345, 7)
n = len(cs4.constraints)
print(f"[{time.time()-t0:7.1f}s] BW6 verify gadget build: {n:,} constraints")
ok = cs4.check_satisfied()
print(f"[{time.time()-t0:7.1f}s] satisfiable: {ok}")
assert ok, cs4.first_unsatisfied()
