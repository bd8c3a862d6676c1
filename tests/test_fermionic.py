"""Fermionic (Grassmann-graded) tensor algebra validation.

The decisive oracle is :func:`grassmann_oracle` — a brute-force
evaluation of the Grassmann integral defining a closed fermionic tensor
network (every bond variable pair integrated with the theta-before-
theta-bar cap convention).  The graded ``AbelianTensor`` ops must
reproduce it for ANY pairwise contraction order; operator tests pin the
second-quantization conventions against exact Fock-space computations.
"""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from tpeps.sym.tensor import AbelianTensor, leg, _parity, svd_blockwise
from tpeps.groups.fermions import SpinfulFermionsU1, ordered_pair


# --------------------------------------------------------------- oracle
def grassmann_oracle(tensors, bonds):
    """Contract a CLOSED fermionic network to a scalar by brute force.

    :param tensors: list of fermionic AbelianTensors.
    :param bonds: list of ((ti, li), (tj, lj)) leg pairs; every leg of
        every tensor must appear in exactly one bond, with opposite
        signatures.
    :return: complex scalar.

    Global monomial convention: tensors in list order, each tensor's
    legs in its leg order.  Integrating a bond removes its two symbols:
    sign (-1)^{p * (#odd symbols strictly between)} for bringing them
    adjacent, and (-1)^p more if the dual (sig -1) symbol precedes the
    ket.  This is manifestly a definition of the network value —
    independent of any contraction strategy.
    """
    legpos = {}
    for bi, (a, b) in enumerate(bonds):
        legpos[a] = bi
        legpos[b] = bi

    # enumerate charge assignments per bond
    bond_charges = []
    for (ti, li), (tj, lj) in bonds:
        qa = set(tensors[ti].legs[li].dims)
        qb = set(tensors[tj].legs[lj].dims)
        # charges must be equal on both sides (opposite signatures)
        bond_charges.append(sorted(qa & qb, key=str))

    total = 0.0 + 0.0j
    sym = tensors[0].sym
    for assign in itertools.product(*bond_charges):
        # block charges per tensor
        ok = True
        tblocks = []
        for ti, t in enumerate(tensors):
            qs = tuple(assign[legpos[(ti, li)]] for li in range(t.ndim))
            blk = t.blocks.get(qs)
            if blk is None:
                ok = False
                break
            tblocks.append(np.asarray(blk))
        if not ok:
            continue

        # sign: simulate bond-by-bond removal from the global symbol list
        symbols = []  # (bond_id, parity, is_ket)
        for ti, t in enumerate(tensors):
            for li in range(t.ndim):
                bi = legpos[(ti, li)]
                symbols.append((bi, t.leg_parity(li, assign[bi]), t.signature[li] == 1))
        sign = 1.0
        for bi in range(len(bonds)):
            idx = [k for k, s in enumerate(symbols) if s[0] == bi]
            i0, i1 = idx
            p = symbols[i0][1]
            if p:
                between = sum(1 for k in range(i0 + 1, i1) if symbols[k][1])
                if between % 2:
                    sign = -sign
                if not symbols[i0][2]:  # dual first
                    sign = -sign
            del symbols[i1], symbols[i0]

        # numeric: einsum all blocks over bond letters
        letters = "abcdefghijklmnopqrstuvwxyz"
        subs = []
        for ti, t in enumerate(tensors):
            subs.append("".join(letters[legpos[(ti, li)]] for li in range(t.ndim)))
        val = np.einsum(",".join(subs) + "->", *tblocks)
        total += sign * complex(val)
    return total


def _rand_even(rng, sym, signature, legs_, fermionic=True):
    t = AbelianTensor(sym, signature, legs_, 0, dtype=jnp.complex128, fermionic=fermionic)
    for qs in t.all_allowed_blocks():
        sh = t.block_shape(qs)
        t.blocks[qs] = rng.standard_normal(sh) + 1j * rng.standard_normal(sh)
    return t


L = leg({-1: 1, 0: 2, 1: 1})


def _pairwise(tensors, bonds, order):
    """Contract the network pairwise with AbelianTensor.tensordot in the
    given order of tensor merges; returns the scalar."""
    ts = {i: t for i, t in enumerate(tensors)}
    group = {i: frozenset([i]) for i in ts}  # which original tensors merged
    legmap = {i: [(i, l) for l in range(t.ndim)] for i, t in ts.items()}
    bond_of = {}
    for (a, b) in bonds:
        bond_of[a] = b
        bond_of[b] = a

    for (i, j) in order:
        gi = next(k for k, g in group.items() if i in g)
        gj = next(k for k, g in group.items() if j in g)
        assert gi != gj
        A, B = ts[gi], ts[gj]
        la, lb = legmap[gi], legmap[gj]
        ax_a, ax_b = [], []
        for pa, lega in enumerate(la):
            partner = bond_of[lega]
            if partner in lb:
                ax_a.append(pa)
                ax_b.append(lb.index(partner))
        C = A.tensordot(B, (tuple(ax_a), tuple(ax_b)))
        newlegs = [l for p, l in enumerate(la) if p not in ax_a] + [
            l for p, l in enumerate(lb) if p not in ax_b
        ]
        del ts[gj], legmap[gj]
        ts[gi] = C
        legmap[gi] = newlegs
        group[gi] = group[gi] | group.pop(gj)

    (last,) = ts.values()
    # self-bonds remain: contract leg pairs via trace using tensordot w/ identity
    (gid,) = group
    lm = legmap[gid]
    while last.ndim:
        partner = bond_of[lm[0]]
        p1 = lm.index(partner)
        # build identity tensor matching legs (0, p1)
        q_dims = dict(last.legs[0].charges)
        sig = (-last.signature[0], -last.signature[p1])
        eye = AbelianTensor(last.sym, sig, (last.legs[0], last.legs[p1]), 0,
                            dtype=last.dtype, fermionic=True)
        for q in q_dims:
            eye.blocks[(q, q)] = np.eye(q_dims[q], dtype=np.complex128)
        last = last.tensordot(eye, ((0, p1), (0, 1)))
        lm = [l for k, l in enumerate(lm) if k not in (0, p1)]
    vals = list(last.blocks.values())
    return complex(sum(np.asarray(v).reshape(()) for v in vals)) if vals else 0.0j


def test_closed_ring_matches_oracle_any_order():
    rng = np.random.default_rng(0)
    # triangle of rank-3 even tensors: bonds (0-1), (1-2), (2-0), plus a
    # third leg per tensor closed against a rank-1... use ring of rank-2
    # + one rank-4 to mix: tensors A(2 legs), B(3), C(3)
    A = _rand_even(rng, "U1", (1, -1), (L, L))
    B = _rand_even(rng, "U1", (1, 1, -1), (L, L, L))
    C = _rand_even(rng, "U1", (-1, 1, -1), (L, L, L))
    bonds = [((0, 0), (2, 2)), ((0, 1), (1, 0)), ((1, 1), (2, 0)), ((1, 2), (2, 1))]
    tensors = [A, B, C]
    want = grassmann_oracle(tensors, bonds)
    assert abs(want) > 1e-8  # nontrivial
    for order in ([(0, 1), (0, 2)], [(1, 2), (0, 1)], [(0, 2), (0, 1)]):
        got = _pairwise(tensors, bonds, order)
        assert got == pytest.approx(want, rel=1e-12), order


def test_closed_ring_with_transposes():
    """Graded transpose must leave the network value invariant when the
    bond bookkeeping follows the permutation."""
    rng = np.random.default_rng(1)
    A = _rand_even(rng, "U1", (1, -1), (L, L))
    B = _rand_even(rng, "U1", (1, 1, -1), (L, L, L))
    C = _rand_even(rng, "U1", (-1, 1, -1), (L, L, L))
    bonds = [((0, 0), (2, 2)), ((0, 1), (1, 0)), ((1, 1), (2, 0)), ((1, 2), (2, 1))]
    want = grassmann_oracle([A, B, C], bonds)
    Bp = B.transpose((2, 0, 1))
    bonds_p = [((0, 0), (2, 2)), ((0, 1), (1, 1)), ((1, 2), (2, 0)), ((1, 0), (2, 1))]
    got = grassmann_oracle([A, Bp, C], bonds_p)
    assert got == pytest.approx(want, rel=1e-12)
    got2 = _pairwise([A, Bp, C], bonds_p, [(1, 2), (0, 1)])
    assert got2 == pytest.approx(want, rel=1e-12)


def test_norm_positive_and_matches_fock():
    """<psi|psi> of a 2-site state: graded network == sum of |amplitudes|^2."""
    rng = np.random.default_rng(2)
    # |psi> = sum_{s1 s2 a} A[s1,a] B[s2,a] |s1 s2>  (bond a, phys s1,s2)
    A = _rand_even(rng, "U1", (1, -1), (L, L))
    B = _rand_even(rng, "U1", (1, 1), (L, L))
    # amplitudes in the ORDERED Fock basis are the graded contraction
    psi = A.tensordot(B, ((1,), (1,)))  # (s1, s2)
    amps = np.asarray(psi.to_dense())
    want = float(np.sum(np.abs(amps) ** 2))

    Ac, Bc = A.conj(), B.conj()
    # network: A,B,Ac,Bc ; bonds: A.a-B.a, Ac.a-Bc.a, A.s1-Ac.s1, B.s2-Bc.s2
    bonds = [((0, 1), (1, 1)), ((2, 1), (3, 1)), ((0, 0), (2, 0)), ((1, 0), (3, 0))]
    got = grassmann_oracle([A, B, Ac, Bc], bonds)
    assert got.imag == pytest.approx(0.0, abs=1e-10)
    assert got.real == pytest.approx(want, rel=1e-12)
    got2 = _pairwise([A, B, Ac, Bc], bonds, [(0, 1), (2, 3), (0, 2)])
    assert got2 == pytest.approx(want, rel=1e-12)


# ----------------------------------------------------- operator algebra
def _fock_ops():
    """Exact 2-mode (single-site) operators in the ordered basis
    |0>, u+|0>, d+|0>, u+ d+|0>  (dense 4x4, Jordan-Wigner within site)."""
    a = np.array([[0, 1], [0, 0]], dtype=complex)  # single-mode annihilation
    P = np.diag([1.0, -1.0])
    I2 = np.eye(2)
    # mode order (u, d); kron basis (|n_u n_d>) = (0, d, u, ud) -> permute
    # to (0, u, d, ud)
    perm = np.zeros((4, 4))
    for i, j in enumerate((0, 2, 1, 3)):
        perm[i, j] = 1.0
    c_u = perm @ np.kron(a, I2) @ perm.T
    c_d = perm @ np.kron(P, a) @ perm.T
    return c_u, c_d


def _dense_op(op, order):
    """Embed a graded rank-2 operator into the 4x4 dense basis.
    ``order``: list of (charge, index_within_sector) for basis states."""
    M = np.zeros((len(order), len(order)), dtype=complex)
    for i, (qo, io) in enumerate(order):
        for j, (qi, ij) in enumerate(order):
            blk = op.blocks.get((qo, qi))
            if blk is not None:
                M[i, j] = np.asarray(blk)[io, ij]
    return M


def test_spinful_ops_match_fock():
    sf = SpinfulFermionsU1(shift=-1)
    q0, q1, q2 = sf.qs
    order = [(q0, 0), (q1, 0), (q1, 1), (q2, 0)]  # |0>, u, d, ud
    c_u, c_d = _fock_ops()
    assert np.allclose(_dense_op(sf.c("u"), order), c_u)
    assert np.allclose(_dense_op(sf.c("d"), order), c_d)
    assert np.allclose(_dense_op(sf.cp("u"), order), c_u.conj().T)
    assert np.allclose(_dense_op(sf.cp("d"), order), c_d.conj().T)
    assert np.allclose(_dense_op(sf.n("u"), order), c_u.conj().T @ c_u)
    assert np.allclose(_dense_op(sf.n("d"), order), c_d.conj().T @ c_d)
    # on-site product via graded matmul
    hop = sf.matmul(sf.cp("u"), sf.c("d"))
    assert np.allclose(_dense_op(hop, order), c_u.conj().T @ c_d)


def test_ordered_pair_two_site_hopping():
    """<psi| c+_i c_j |psi> on an exact 2-site (4-mode) Fock space vs the
    graded-network evaluation with string legs."""
    rng = np.random.default_rng(3)
    sf = SpinfulFermionsU1(shift=-1)
    P = sf.phys

    # random 2-site state: psi[s1, s2] even (total charge 0)
    psi_t = _rand_even(rng, "U1", (1, 1), (P, P))
    amps = np.asarray(psi_t.to_dense())  # ordered-basis amplitudes, sites (1,2)

    # exact: 4 modes ordered (u1, d1, u2, d2); site basis kron(site1, site2)
    c_u, c_d = _fock_ops()
    P4 = np.diag([1.0, -1, -1, 1])  # site parity
    I4 = np.eye(4)
    ops1 = {"cu": np.kron(c_u, I4), "cd": np.kron(c_d, I4)}
    ops2 = {"cu": np.kron(P4, c_u), "cd": np.kron(P4, c_d)}
    vec = amps.reshape(-1)
    nrm = vec.conj() @ vec

    graded = {"cu": sf.c("u"), "cd": sf.c("d")}
    for k1 in ("cu", "cd"):
        for k2 in ("cu", "cd"):
            exact = (vec.conj() @ ops1[k1].conj().T @ ops2[k2] @ vec) / nrm

            # graded: O = ordered_pair(cp_1, c_2); <O> = network
            # psi, O, psi.conj closed over (s1,s2, s1', s2')
            O = ordered_pair(graded[k1].conj().transpose((1, 0)), graded[k2])
            # legs of O: (out1, in1, out2, in2)... conj().transpose flips
            # c -> c+ as a graded tensor
            psic = psi_t.conj()
            bonds = [
                ((0, 0), (1, 1)),  # psi.s1 - O.in1
                ((0, 1), (1, 3)),  # psi.s2 - O.in2
                ((1, 0), (2, 0)),  # O.out1 - psic.s1
                ((1, 2), (2, 1)),  # O.out2 - psic.s2
            ]
            got = grassmann_oracle([psi_t, O, psic], bonds) / nrm
            assert got == pytest.approx(exact, rel=1e-10, abs=1e-12), (k1, k2)


def test_three_site_chain_nonadjacent_hopping():
    """<c+_i c_j> on a 3-site chain INCLUDING the non-adjacent pair
    (1,3): the graded contraction must reproduce the Jordan-Wigner
    string through the middle site with no explicit string routing."""
    rng = np.random.default_rng(7)
    sf = SpinfulFermionsU1(shift=-1)
    P = sf.phys
    # MPS-like chain:  M1[s1, a]  M2[a*, s2, b]  M3[b*, s3]
    M1 = _rand_even(rng, "U1", (1, -1), (P, L))
    M2 = _rand_even(rng, "U1", (1, 1, -1), (L, P, L))
    M3 = _rand_even(rng, "U1", (1, 1), (L, P))
    # amplitudes psi[s1, s2, s3] via graded contraction (leg order kept)
    psi = M1.tensordot(M2, ((1,), (0,)))          # (s1, s2, b)
    psi = psi.tensordot(M3, ((2,), (0,)))         # (s1, s2, s3)
    amps = np.asarray(psi.to_dense())
    vec = amps.reshape(-1)
    nrm = vec.conj() @ vec

    # exact 6-mode Fock ops, modes ordered (u1,d1,u2,d2,u3,d3)
    c_u, c_d = _fock_ops()
    P4 = np.diag([1.0, -1, -1, 1])
    I4 = np.eye(4)
    site_ops = {"cu": c_u, "cd": c_d}

    def op_at(k, site):  # JW-dressed annihilation of mode k at site (0,1,2)
        mats = [P4] * site + [site_ops[k]] + [I4] * (2 - site)
        out = mats[0]
        for mm in mats[1:]:
            out = np.kron(out, mm)
        return out

    graded = {"cu": sf.c("u"), "cd": sf.c("d")}
    for (i, j) in ((0, 1), (0, 2), (1, 2)):
        for k1, k2 in (("cu", "cd"), ("cd", "cu"), ("cu", "cu")):
            exact = (vec.conj() @ op_at(k1, i).conj().T @ op_at(k2, j) @ vec) / nrm
            O = ordered_pair(graded[k1].conj().transpose((1, 0)), graded[k2])
            psic = psi.conj()
            # bonds: psi.si - O.in1 ; psi.sj - O.in2 ; O.out1 - psic.si ;
            # O.out2 - psic.sj ; spectator phys legs traced psi-psic
            spect = [s for s in range(3) if s not in (i, j)]
            bonds = [
                ((0, i), (1, 1)), ((0, j), (1, 3)),
                ((1, 0), (2, i)), ((1, 2), (2, j)),
            ] + [((0, s), (2, s)) for s in spect]
            got = grassmann_oracle([psi, O, psic], bonds) / nrm
            assert got == pytest.approx(exact, rel=1e-10, abs=1e-12), (i, j, k1, k2)


def test_svd_graded_reconstruction_and_projector_identity():
    rng = np.random.default_rng(4)
    T = _rand_even(rng, "U1", (1, 1, -1, -1), (L, L, L, L))
    U, S, V = svd_blockwise(T, (0, 1), (2, 3))
    US = U.copy_with({q: np.asarray(b) * np.asarray(S[q[-1]]) for q, b in U.blocks.items()})
    T2 = US.tensordot(V, ((2,), (0,)))
    err = (T + (-1.0) * T2).norm()
    assert float(err) < 1e-10

    # full-rank projector insertion (the CTM truncation identity):
    # M = R.Rt ; P = R.U*.S^-1/2 ; Pt = Rt.V+.S^-1/2 ; then R.P ~ Pt-col
    # basis and (P)(Pt) inserted between R and Rt must reproduce R.Rt.
    R = _rand_even(rng, "U1", (1, 1, -1), (L, L, L))
    Rt = _rand_even(rng, "U1", (-1, -1, 1), (L, L, L))
    M = R.tensordot(Rt, ((0, 1), (0, 1)))  # (r, rt)
    U, S, V = svd_blockwise(M, (0,), (1,))
    isq = {q: 1.0 / np.sqrt(np.asarray(s)) for q, s in S.items()}

    def scale(t, vecs):
        return t.copy_with({qs: np.asarray(b) * vecs[qs[-1]].reshape((1,) * (b.ndim - 1) + (-1,))
                            for qs, b in t.blocks.items()})

    P = scale(R.tensordot(U.conj(), ((2,), (0,))), isq)       # (x, y, chi)
    Vd = V.conj().transpose((1, 0))                            # (rt, chi)
    Pt = scale(Rt.tensordot(Vd, ((2,), (0,))), isq)            # (xt, yt, chi)
    # full-rank insertion identity (the CTM truncation step,
    # mirror of tpeps/ctm/generic_abelian/projectors.py):
    #   R . [Pt . P] . Rt == R . Rt   since  PPt = Rt M^-1 R^T  and
    #   (R^T Rt) M^-1 (R^T Rt) = M M^-1 M = M  per charge sector.
    PPt = Pt.tensordot(P, ((2,), (2,)))            # (xt, yt, x, y)
    Mins = R.tensordot(PPt, ((0, 1), (0, 1))).tensordot(Rt, ((1, 2), (0, 1)))
    err2 = (M + (-1.0) * Mins).norm()
    assert float(err2) / float(M.norm()) < 1e-9
