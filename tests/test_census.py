"""Census LeanIMT vs the Solidity-compatibility vectors embedded in the
reference (census/censusdb/solidity_compatibility_test.go)."""

import random

from davinci_tpu.census import CensusDB, LeanIMT, pack_census_leaf

VECTORS = [
    (0x11311A2D24A77B6722D7F149B1D9C07C9BDEA16C, 3,
     30375291384970416511893979679789548485304528155904142667949947072733511683),
    (0xDEB8699659BE5D41A0E57E179D6CB42E00B9200C, 5,
     393512816336772966013610099784681212633281617183806452230580222634896654341),
    (0xB1F05B11BA3D892EDD00F2E7689779E2B8841827, 10,
     314390804811074276967079782683711089676526237735633884656712510764325273610),
    (0xF3B06B503652A5E075D423F97056DFDE0C4B066F, 1,
     430561437259806371587364395789749002591099599069915338412709746798562902017),
    (0x74D8967E812DE34702ECD3D453A44BF37440B10B, 3,
     206449094039689427672812727578991218956029384713924405301323341242967261187),
]
EXPECTED_ROOT = 2787380653956260171806300121381944173535678873703019698747166416543300224801


def test_solidity_compatibility_vectors():
    db = CensusDB()
    ref = db.new("test")
    for addr, weight, want_leaf in VECTORS:
        assert pack_census_leaf(addr, weight) == want_leaf
        db.insert("test", addr, weight)
    root = db.publish("test")
    assert root == EXPECTED_ROOT


def test_proofs_all_sizes():
    r = random.Random(3)
    t = LeanIMT()
    leaves = []
    for n in range(1, 20):
        leaf = r.randrange(2**200)
        leaves.append(leaf)
        t.insert(leaf)
        for i in range(n):
            lf, idx, sib, bits = t.prove(i)
            assert lf == leaves[i]
            assert LeanIMT.verify(t.root, lf, sib, bits)
        # tampered proof fails
        lf, idx, sib, bits = t.prove(0)
        assert not LeanIMT.verify(t.root, lf + 1, sib, bits)


def test_update_and_census_proofs():
    db = CensusDB()
    db.new("c")
    addrs = [(i + 1) * 7919 for i in range(6)]
    for a in addrs:
        db.insert("c", a, 2)
    db.update_weight("c", addrs[2], 9)
    root = db.publish("c")
    p = db.proof_by_root(root, addrs[2])
    assert p["weight"] == 9
    assert CensusDB.verify_proof(p)
    p["weight"] = 10
    assert not CensusDB.verify_proof(p)
