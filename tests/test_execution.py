"""Stateless block execution layer (sbv/revm analog): MPT state, EVM
interpreter, transaction execution, block sealing/verification, and the
chunk-level fold into ChunkInfo.

Reference analog: crates/types/chunk/src/scroll/execute.rs:21-91 via
sbv_core::verifier::run."""

import pytest

from zkvm_prover_tpu.execution import block as blk
from zkvm_prover_tpu.execution import mpt, rlp
from zkvm_prover_tpu.execution.interpreter import (
    BlockCtx,
    Message,
    TxCtx,
    execute_message,
)
from zkvm_prover_tpu.execution.state import Account, WorldState
from zkvm_prover_tpu.ops.keccak import keccak256
from zkvm_prover_tpu.types.chunk.crypto.weierstrass import SECP256K1 as C

# --- test identities -------------------------------------------------------

ALICE_PRIV = 0xA11CE
BOB = b"\xB0" * 20
COINBASE = b"\xFE" * 20


def _priv_to_addr(priv: int) -> bytes:
    q = C.mul(priv, C.generator())
    pub = q[0].to_bytes(32, "big") + q[1].to_bytes(32, "big")
    return keccak256(pub)[12:]


ALICE = _priv_to_addr(ALICE_PRIV)

# SSTORE(0, CALLDATALOAD(0)); STOP
SETTER_CODE = bytes.fromhex("60003560005500")
SETTER = b"\xC0\xDE" + b"\x00" * 18


def _sign(tx: blk.Tx, priv: int) -> blk.Tx:
    z = int.from_bytes(tx.sign_hash(), "big") % C.n
    k = int.from_bytes(keccak256(tx.sign_hash()
                                 + priv.to_bytes(32, "big")), "big") % C.n
    while True:
        R = C.mul(k, C.generator())
        r = R[0] % C.n
        s = pow(k, C.n - 2, C.n) * (z + r * priv) % C.n
        if r and s:
            break
        k += 1
    rec = R[1] & 1
    if s > C.n // 2:  # low-s normalization flips recovery parity
        s = C.n - s
        rec ^= 1
    if tx.tx_type == 0:
        tx.v = rec + 35 + 2 * tx.chain_id if tx.chain_id else rec + 27
    else:
        tx.v = rec
    tx.r, tx.s = r, s
    return tx


def _genesis():
    """Full genesis trie + code store: Alice funded, setter contract,
    withdraw-queue predeploy with a non-zero root in slot 0."""
    trie = mpt.Mpt(mpt.EMPTY_ROOT)
    codes = {}

    def put_account(addr, acct):
        trie.update(mpt.secure_key(addr), acct.rlp())

    put_account(ALICE, Account(nonce=0, balance=10**18))
    code_hash = keccak256(SETTER_CODE)
    codes[code_hash] = SETTER_CODE
    put_account(SETTER, Account(code_hash=code_hash))
    # withdraw predeploy: storage slot 0 = 0xAB..  (own storage trie)
    st = mpt.Mpt(mpt.EMPTY_ROOT, trie.nodes)
    st.update(mpt.secure_key((0).to_bytes(32, "big")),
              rlp.encode_int(0xAB
                             << 248))
    put_account(blk.WITHDRAW_QUEUE_ADDRESS,
                Account(storage_root=st.root))
    return trie, codes


def _mk_txs(chain_id=534352):
    t1 = _sign(blk.Tx(tx_type=0, nonce=0, gas_limit=21000, to=BOB,
                      value=12345, data=b"", gas_price=10,
                      chain_id=chain_id), ALICE_PRIV)
    t2 = _sign(blk.Tx(tx_type=2, nonce=1, gas_limit=100000, to=SETTER,
                      value=0, data=(77).to_bytes(32, "big"),
                      max_fee=100, max_priority_fee=2,
                      chain_id=chain_id), ALICE_PRIV)
    t3 = blk.Tx(tx_type=blk.L1_MSG_TX_TYPE, nonce=0, gas_limit=100000,
                to=BOB, value=0, data=b"", sender=b"\x11" * 20)
    return [t1, t2, t3]


def _seal_block(trie, codes, txs, number=1, base_fee=1):
    """Oracle pass over the full trie to produce a valid sealed header."""
    state = WorldState(trie.root, dict(trie.nodes), dict(codes))
    block = BlockCtx(number=number, timestamp=1000 + number,
                     coinbase=COINBASE, gas_limit=30_000_000,
                     base_fee=base_fee)
    receipts, gas = [], 0
    for tx in txs:
        r, g = blk.execute_tx(state, block, tx, gas)
        gas += g
        receipts.append(r)
    post_root = state.state_root()
    hdr = blk.Header(
        parent_hash=b"\x33" * 32,
        coinbase=COINBASE,
        state_root=post_root,
        transactions_root=blk._ordered_trie_root(
            [t.encode() for t in txs]),
        receipts_root=blk._ordered_trie_root(
            [r.encode() for r in receipts]),
        number=number,
        gas_limit=30_000_000,
        gas_used=gas,
        timestamp=1000 + number,
        base_fee_per_gas=base_fee,
    )
    return hdr, state


def _collect_witness(trie, codes, touched_addrs, touched_storage):
    nodes = {}
    for addr in touched_addrs:
        for n in trie.collect_path_nodes(mpt.secure_key(addr)):
            nodes[keccak256(n)] = n
    for addr, slots in touched_storage.items():
        raw = trie.get(mpt.secure_key(addr))
        if raw is None:
            continue
        acct = Account.from_rlp(raw)
        st = mpt.Mpt(acct.storage_root, trie.nodes)
        for slot in slots:
            for n in st.collect_path_nodes(
                    mpt.secure_key(slot.to_bytes(32, "big"))):
                nodes[keccak256(n)] = n
    return nodes


@pytest.fixture()
def sealed():
    trie, codes = _genesis()
    txs = _mk_txs()
    hdr, _oracle = _seal_block(trie, codes, txs)
    touched = [ALICE, BOB, SETTER, COINBASE, b"\x11" * 20,
               blk.WITHDRAW_QUEUE_ADDRESS,
               # L1 data fee: the oracle account's (absence-)path must be
               # provable from the witness, exactly as sbv witnesses carry it
               blk.L1_GAS_PRICE_ORACLE_ADDRESS]
    nodes = _collect_witness(trie, codes, touched,
                             {SETTER: [0],
                              blk.WITHDRAW_QUEUE_ADDRESS: [0]})
    witness = blk.BlockWitness(header=hdr, txs=txs, state_nodes=nodes,
                               codes=dict(codes))
    return trie, witness


def test_execute_block_from_partial_witness(sealed):
    trie, witness = sealed
    summaries, pre, post, wroot = blk.execute_chunk_blocks(
        [witness], trie.root)
    assert pre == trie.root
    assert post == witness.header.state_root
    assert summaries[0].gas_used == witness.header.gas_used
    assert summaries[0].block_hash == witness.header.block_hash()
    assert wroot[0] == 0xAB  # predeploy slot surfaced as withdraw root
    # L1 msg hash recorded, l2 txs exclude it
    assert len(summaries[0].l1_msg_hashes) == 1
    assert len(summaries[0].encoded_l2_txs) == 2


def test_execution_updates_balances_and_storage(sealed):
    trie, witness = sealed
    _, post, state = blk.execute_block(witness, trie.root)
    assert post == witness.header.state_root
    # bob got the transfer
    assert state.get_balance(BOB) == 12345
    # setter stored calldata word
    assert state.get_storage(SETTER, 0) == 77
    # alice paid: value + fees; nonce advanced twice
    assert state.get_nonce(ALICE) == 2
    assert state.get_balance(ALICE) < 10**18 - 12345


def test_tampered_header_rejected(sealed):
    trie, witness = sealed
    import copy

    for fieldname, delta in [("gas_used", 1), ("state_root", None),
                             ("transactions_root", None),
                             ("receipts_root", None)]:
        w = copy.deepcopy(witness)
        if delta is not None:
            setattr(w.header, fieldname,
                    getattr(w.header, fieldname) + delta)
        else:
            v = bytearray(getattr(w.header, fieldname))
            v[0] ^= 1
            setattr(w.header, fieldname, bytes(v))
        with pytest.raises(blk.ExecutionError):
            blk.execute_chunk_blocks([w], trie.root)


def test_missing_witness_node_detected(sealed):
    trie, witness = sealed
    import copy

    w = copy.deepcopy(witness)
    w.state_nodes = {}
    with pytest.raises(mpt.MissingNode):
        blk.execute_chunk_blocks([w], trie.root)


def test_bad_signature_rejected(sealed):
    trie, witness = sealed
    import copy

    w = copy.deepcopy(witness)
    w.txs[0].r ^= 1
    with pytest.raises((blk.ExecutionError, ValueError)):
        blk.execute_chunk_blocks([w], trie.root)


def test_sender_recovery_roundtrip():
    tx = _sign(blk.Tx(tx_type=0, nonce=0, gas_limit=21000, to=BOB,
                      value=1, data=b"", gas_price=10, chain_id=534352),
               ALICE_PRIV)
    assert tx.recover_sender() == ALICE
    tx2 = _sign(blk.Tx(tx_type=2, nonce=5, gas_limit=50000, to=None,
                       value=0, data=b"\x00", max_fee=30,
                       max_priority_fee=1, chain_id=534352), ALICE_PRIV)
    assert tx2.recover_sender() == ALICE


def test_evm_call_semantics():
    """CREATE + storage + revert rollback in one flow."""
    state = WorldState(mpt.EMPTY_ROOT, {}, {})
    state.add_balance(ALICE, 10**18)
    block = BlockCtx()
    txctx = TxCtx(origin=ALICE)
    # deploy the setter via CREATE: initcode returns SETTER_CODE
    init = (bytes.fromhex("66")  # PUSH7 code
            + SETTER_CODE
            + bytes.fromhex("5F5260076019F3"))  # MSTORE; RETURN(25,7)
    res = execute_message(
        state, block, txctx,
        Message(caller=ALICE, to=None, value=0, data=init, gas=200000))
    assert res.success and res.created is not None
    created = res.created
    assert state.get_code(created) == SETTER_CODE
    # call it
    res2 = execute_message(
        state, block, txctx,
        Message(caller=ALICE, to=created, value=0,
                data=(42).to_bytes(32, "big"), gas=100000))
    assert res2.success
    assert state.get_storage(created, 0) == 42
    # REVERT rolls the write back: code = SSTORE(0, 7); REVERT(0,0)
    rev_code = bytes.fromhex("600760005560006000FD")
    h = keccak256(rev_code)
    state.codes[h] = rev_code
    raddr = b"\xEE" * 20
    state.create_account(raddr)
    state.accounts[raddr].code_hash = h
    res3 = execute_message(
        state, block, txctx,
        Message(caller=ALICE, to=raddr, value=0, data=b"", gas=100000))
    assert not res3.success
    assert state.get_storage(raddr, 0) == 0  # rolled back


def test_precompiles_in_call():
    """STATICCALL into sha256 precompile from bytecode."""
    state = WorldState(mpt.EMPTY_ROOT, {}, {})
    import hashlib

    # store "abc" at mem 0, staticcall 0x02 with 3 bytes, return 32 bytes
    code = bytes.fromhex(
        "7f" + b"abc".ljust(32, b"\x00").hex()  # PUSH32 "abc..."
        + "5f52"                                  # MSTORE(0)
        + "60205f60035f6002612710fa50"            # STATICCALL
        + "60205ff3"                              # RETURN(0,32)
    )
    h = keccak256(code)
    state.codes[h] = code
    addr = b"\xDD" * 20
    state.create_account(addr)
    state.accounts[addr].code_hash = h
    res = execute_message(
        state, BlockCtx(), TxCtx(),
        Message(caller=ALICE, to=addr, value=0, data=b"", gas=100000))
    assert res.success
    assert res.output == hashlib.sha256(b"abc").digest()


def test_chunk_circuit_reexecutes_block_witnesses(sealed):
    """ChunkCircuit.validate with full block witnesses: serialize ->
    deserialize -> re-execute -> ChunkInfo; a tampered header must fail
    validation (the reference execute() path, main.rs:14-29)."""
    from zkvm_prover_tpu.circuits.chunk_circuit import ChunkCircuit
    from zkvm_prover_tpu.types.base.fork_name import ForkName
    from zkvm_prover_tpu.types.chunk.witness import ChunkWitness

    from zkvm_prover_tpu.types.base.version import Version

    trie, witness = sealed
    cw = ChunkWitness(
        version=Version.euclid_v2().as_version_byte(),
        blocks=[],  # derived by re-execution
        prev_msg_queue_hash=b"\x00" * 32,
        fork_name=ForkName.EUCLID_V2,
        prev_state_root=trie.root,
        block_witnesses=[witness],
    )
    raw = ChunkCircuit.serialize_witness(cw)
    rt = ChunkCircuit.deserialize_witness(raw)
    info, version = ChunkCircuit.validate(rt)
    assert info.post_state_root == witness.header.state_root
    assert info.block_ctxs[0].num_txs == 3
    # tamper: header gas_used
    rt2 = ChunkCircuit.deserialize_witness(raw)
    rt2.block_witnesses[0].header.gas_used += 1
    with pytest.raises(Exception):
        ChunkCircuit.validate(rt2)
    # tamper: claimed post root contradicting execution
    rt3 = ChunkCircuit.deserialize_witness(raw)
    rt3.post_state_root = b"\x01" * 32
    with pytest.raises(Exception):
        ChunkCircuit.validate(rt3)


def test_chunk_info_from_real_execution(sealed):
    """Full path: witness -> execution -> ChunkWitness -> ChunkInfo."""
    from zkvm_prover_tpu.types.base.fork_name import ForkName
    from zkvm_prover_tpu.types.chunk.witness import (
        ChunkWitness,
        chunk_info_from_execution,
    )

    trie, witness = sealed
    summaries, pre, post, wroot = blk.execute_chunk_blocks(
        [witness], trie.root)
    cw = ChunkWitness(
        version=8,
        blocks=summaries,
        prev_msg_queue_hash=b"\x00" * 32,
        fork_name=ForkName.EUCLID_V2,
        prev_state_root=pre,
        post_state_root=post,
        withdraw_root=wroot,
        prev_blockhash=witness.header.parent_hash,
    )
    info = chunk_info_from_execution(cw)
    assert info.post_state_root == witness.header.state_root
    assert info.withdraw_root == wroot
    assert info.tx_data_length > 0
    assert info.block_ctxs[0].num_txs == 3
    assert info.block_ctxs[0].num_l1_msgs == 1
    assert info.post_blockhash == witness.header.block_hash()


def test_eip2929_consensus_gas():
    """EIP-2929 warm/cold + EIP-2200/3529 SSTORE costs: exact consensus
    values for canonical sequences (go-ethereum reference costs)."""
    state = WorldState(mpt.EMPTY_ROOT, {}, {})
    block = BlockCtx()

    def run(code, storage=None, gas=1_000_000):
        h = keccak256(code)
        state.codes[h] = code
        addr = b"\xAA" * 20
        if addr not in state.accounts:
            state.create_account(addr)
        state.accounts[addr].code_hash = h
        if storage:
            for k, v in storage.items():
                state.set_storage(addr, k, v)
        txctx = TxCtx(origin=ALICE)
        txctx.warm_addresses.update({ALICE, addr})
        res = execute_message(
            state, block, txctx,
            Message(caller=ALICE, to=addr, value=0, data=b"", gas=gas))
        assert res.success, code.hex()
        return gas - res.gas_left, res.gas_refund

    # cold SLOAD then warm SLOAD of the same slot:
    # PUSH1 0 (3) SLOAD (2100 cold) POP (2) PUSH1 0 (3) SLOAD (100 warm)
    # POP (2) STOP
    used, _ = run(bytes.fromhex("60005450600054500000"))
    assert used == 3 + 2100 + 2 + 3 + 100 + 2, used

    # SSTORE 0 -> 1 on a cold zero slot: 2100 + 20000 (+ 2x PUSH1)
    used, refund = run(bytes.fromhex("600160005500"))
    assert used == 3 + 3 + 22100, used
    assert refund == 0

    # SSTORE 1 -> 0 (original 1): cold 2100 + reset 2900, refund 4800
    state2 = WorldState(mpt.EMPTY_ROOT, {}, {})
    state = state2
    used, refund = run(bytes.fromhex("600060005500"), storage={0: 1})
    assert used == 3 + 3 + 2100 + 2900, used
    assert refund == 4800

    # no-op SSTORE (1 -> 1): cold 2100 + warm 100
    state = WorldState(mpt.EMPTY_ROOT, {}, {})
    used, refund = run(bytes.fromhex("600160005500"), storage={0: 1})
    assert used == 3 + 3 + 2100 + 100, used

    # BALANCE cold then warm: PUSH20 addr BALANCE POP x2
    state = WorldState(mpt.EMPTY_ROOT, {}, {})
    tgt = bytes.fromhex("73") + BOB + bytes.fromhex("3150")
    used, _ = run(tgt + tgt + b"\x00")
    assert used == 3 + 2600 + 2 + 3 + 100 + 2, used


def test_eip2929_revert_unwinds_warmth():
    """A reverted scope's access-set additions must be undone: the same
    SLOAD is cold again after the inner frame reverts."""
    state = WorldState(mpt.EMPTY_ROOT, {}, {})
    block = BlockCtx()
    # inner: SLOAD(0); REVERT(0,0)
    inner = bytes.fromhex("600054506000" + "6000fd")
    ih = keccak256(inner)
    state.codes[ih] = inner
    iaddr = b"\xE1" * 20
    state.create_account(iaddr)
    state.accounts[iaddr].code_hash = ih
    txctx = TxCtx(origin=ALICE)
    res = execute_message(
        state, block, txctx,
        Message(caller=ALICE, to=iaddr, value=0, data=b"", gas=100000))
    assert not res.success
    assert (iaddr, 0) not in txctx.warm_slots
    assert iaddr not in txctx.warm_addresses  # target warmed by caller...

def test_value_transfer_intrinsic_is_21000():
    """A plain value transfer costs exactly the 21000 intrinsic."""
    tx = blk.Tx(tx_type=0, nonce=0, gas_limit=21000, gas_price=1,
                to=BOB, value=1, data=b"")
    assert blk._intrinsic_gas(tx) == 21000
    tx.data = b"\x00\x01"  # 4 (zero byte) + 16 (nonzero byte)
    assert blk._intrinsic_gas(tx) == 21020


def _oracle_genesis(slots):
    """Genesis with Alice funded and the L1GasPriceOracle storage set."""
    trie = mpt.Mpt(mpt.EMPTY_ROOT)
    codes = {}
    trie.update(mpt.secure_key(ALICE), Account(nonce=0, balance=10**18).rlp())
    st = mpt.Mpt(mpt.EMPTY_ROOT, trie.nodes)
    for k, v in slots.items():
        st.update(mpt.secure_key(k.to_bytes(32, "big")), rlp.encode_int(v))
    trie.update(mpt.secure_key(blk.L1_GAS_PRICE_ORACLE_ADDRESS),
                Account(storage_root=st.root).rlp())
    return trie, codes


def test_l1_data_fee_curie_formula():
    """Curie+ fee: (commitScalar*l1BaseFee + size*blobScalar*l1BlobBaseFee)
    / 1e9, charged to the sender and credited to the coinbase, on top of
    the L2 execution gas; never refunded."""
    slots = {blk.ORACLE_L1_BASE_FEE_SLOT: 10**9,
             blk.ORACLE_L1_BLOB_BASE_FEE_SLOT: 5 * 10**8,
             blk.ORACLE_COMMIT_SCALAR_SLOT: 230_759_955_285,
             blk.ORACLE_BLOB_SCALAR_SLOT: 417_565_260}
    trie, codes = _oracle_genesis(slots)
    tx = _sign(blk.Tx(tx_type=0, nonce=0, gas_limit=21000, to=BOB,
                      value=12345, data=b"", gas_price=10,
                      chain_id=534352), ALICE_PRIV)
    state = WorldState(trie.root, dict(trie.nodes), dict(codes))
    expected_fee = (slots[blk.ORACLE_COMMIT_SCALAR_SLOT] * 10**9
                    + len(tx.encode()) * slots[blk.ORACLE_BLOB_SCALAR_SLOT]
                    * 5 * 10**8) // blk.ORACLE_PRECISION
    assert blk.l1_data_fee(state, tx) == expected_fee
    block = BlockCtx(number=1, timestamp=1001, coinbase=COINBASE,
                     gas_limit=30_000_000, base_fee=1)
    blk.execute_tx(state, block, tx, 0)
    assert state.get_balance(ALICE) == (
        10**18 - 12345 - 21000 * 10 - expected_fee)
    assert state.get_balance(COINBASE) == 21000 * 10 + expected_fee


def test_l1_data_fee_precurie_and_l1_msg_exempt():
    """Pre-Curie fee: (calldata gas + overhead) * l1BaseFee * scalar / 1e9
    over the signed-tx RLP bytes; L1 messages pay no L1 fee."""
    slots = {blk.ORACLE_L1_BASE_FEE_SLOT: 10**9,
             blk.ORACLE_OVERHEAD_SLOT: 2100,
             blk.ORACLE_SCALAR_SLOT: 10**9}
    trie, codes = _oracle_genesis(slots)
    tx = _sign(blk.Tx(tx_type=0, nonce=0, gas_limit=21000, to=BOB,
                      value=1, data=b"", gas_price=2,
                      chain_id=534352), ALICE_PRIV)
    state = WorldState(trie.root, dict(trie.nodes), dict(codes))
    raw = tx.encode()
    calldata_gas = sum(4 if b == 0 else 16 for b in raw)
    expected = (calldata_gas + 2100) * 10**9 * 10**9 // blk.ORACLE_PRECISION
    assert blk.l1_data_fee(state, tx) == expected
    l1msg = blk.Tx(tx_type=blk.L1_MSG_TX_TYPE, nonce=0, gas_limit=100000,
                   to=BOB, value=0, data=b"", sender=b"\x11" * 20)
    assert blk.l1_data_fee(state, l1msg) == 0


def test_l1_data_fee_absent_oracle_is_zero(sealed):
    """With no oracle account in the (partial-witness) state the fee is 0
    and the sealed-block fixtures execute unchanged."""
    trie, witness = sealed
    _, post, state = blk.execute_block(witness, trie.root)
    assert post == witness.header.state_root
    tx = witness.txs[0]
    assert blk.l1_data_fee(state, tx) == 0
