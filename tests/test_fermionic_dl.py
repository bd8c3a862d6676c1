"""Fermionic double-layer tensors vs the brute-force Grassmann oracle.

The claim certified here (see tpeps/ctm/generic/dl_fermi.py): the
*bosonic* contraction of per-site sign-dressed double tensors equals
the Grassmann-integral value of the graded ket x bra network, for
arbitrary fermionic tensors, on open patches of any shape — including
patches with fully interior sites.  This is the exactness property
that lets the double-layer CTM (tpeps/ctm/generic/dl.py) contract
fermionic iPEPS with no sign bookkeeping (the role of the swap-gate
double tensors in reference ctm/generic_abelian/corrf_fermionic.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpeps.sym.tensor import AbelianTensor, LegCharges, leg
from tpeps.ctm.generic.dl_fermi import double_tensor, double_tensor_open

from test_fermionic import _pairwise, _rand_even

SIG = (1, 1, 1, -1, -1)
Lb = leg({0: 1})


def _patch(nx, ny, Lp, Lv):
    coords = [(x, y) for y in range(ny) for x in range(nx)]
    legt = {}
    for (x, y) in coords:
        legt[(x, y)] = (Lp,
                        Lv if y > 0 else Lb,
                        Lv if x > 0 else Lb,
                        Lv if y < ny - 1 else Lb,
                        Lv if x < nx - 1 else Lb)
    KI = {c: i for i, c in enumerate(coords)}
    BI = {c: i + len(coords) for i, c in enumerate(coords)}
    bonds = []
    for c in coords:
        bonds.append(((KI[c], 0), (BI[c], 0)))
    for (x, y) in coords:
        if x < nx - 1:
            bonds.append(((KI[(x, y)], 4), (KI[(x + 1, y)], 2)))
            bonds.append(((BI[(x, y)], 4), (BI[(x + 1, y)], 2)))
        if y < ny - 1:
            bonds.append(((KI[(x, y)], 3), (KI[(x, y + 1)], 1)))
            bonds.append(((BI[(x, y)], 3), (BI[(x, y + 1)], 1)))
        for ax in (1, 2, 3, 4):
            if legt[(x, y)][ax] is Lb:
                bonds.append(((KI[(x, y)], ax), (BI[(x, y)], ax)))
    # contraction order: close phys per site first, then merge row-major
    order = ([(KI[c], BI[c]) for c in coords] +
             [(KI[coords[0]], KI[c]) for c in coords[1:]])
    return coords, legt, bonds, order


def _bosonic_patch(nx, ny, coords, Es):
    """Contract fused double tensors E[u,l,d,r] over the patch."""
    lab = {}

    def bid(key):
        if key not in lab:
            lab[key] = len(lab)
        return lab[key]

    args = []
    for (x, y) in coords:
        sub = [bid(("v", x, y - 1)) if y > 0 else bid(("bu", x, y)),
               bid(("h", x - 1, y)) if x > 0 else bid(("bl", x, y)),
               bid(("v", x, y)) if y < ny - 1 else bid(("bd", x, y)),
               bid(("h", x, y)) if x < nx - 1 else bid(("br", x, y))]
        args += [np.asarray(Es[(x, y)]), sub]
    return complex(np.einsum(*args, []))


def _oracle(coords, legt, bonds, order, ts):
    tensors = [ts[c] for c in coords] + [ts[c].conj() for c in coords]
    return complex(_pairwise(tensors, bonds, order))


@pytest.mark.parametrize("nx,ny", [(2, 2), (3, 2), (2, 3)])
def test_patch_norm_matches_oracle(nx, ny):
    rng = np.random.default_rng(4)
    Lp = leg({-1: 1, 0: 2, 1: 1})
    Lv = leg({-1: 1, 0: 1, 1: 1})
    coords, legt, bonds, order = _patch(nx, ny, Lp, Lv)
    ts = {c: _rand_even(rng, "U1", SIG, legt[c]) for c in coords}
    want = _oracle(coords, legt, bonds, order, ts)
    Es = {c: double_tensor(ts[c]) for c in coords}
    got = _bosonic_patch(nx, ny, coords, Es)
    assert abs(want - got) / abs(want) < 1e-12


def test_patch_norm_interior_site():
    """3x3 patch: the center site has no boundary leg at all — the
    dressing must be exact for a fully interior site (small legs to
    keep the brute-force oracle tractable)."""
    rng = np.random.default_rng(9)
    Lp = leg({0: 1, 1: 1})
    Lv = leg({0: 1, 1: 1})
    coords, legt, bonds, order = _patch(3, 3, Lp, Lv)
    ts = {c: _rand_even(rng, "U1", SIG, legt[c]) for c in coords}
    want = _oracle(coords, legt, bonds, order, ts)
    Es = {c: double_tensor(ts[c]) for c in coords}
    got = _bosonic_patch(3, 3, coords, Es)
    assert abs(want - got) / abs(want) < 1e-12


def test_patch_norm_shifted_phys():
    """Charge-shifted physical leg (LegCharges.pshift, the yastn
    half-filling dummy-leg convention): the dressing acts on TRUE
    fermion parities."""
    rng = np.random.default_rng(3)
    Lps = LegCharges(((0, 1), (1, 2), (2, 1)), pshift=1)
    Lv = leg({-1: 1, 0: 1, 1: 1})
    coords, legt, bonds, order = _patch(2, 2, Lps, Lv)
    ts = {c: _rand_even(rng, "U1", SIG, legt[c]) for c in coords}
    want = _oracle(coords, legt, bonds, order, ts)
    Es = {c: double_tensor(ts[c]) for c in coords}
    got = _bosonic_patch(2, 2, coords, Es)
    assert abs(want - got) / abs(want) < 1e-12


def test_open_parity_even_op():
    """double_tensor_open + a parity-even operator == double_tensor of
    the op-inserted site, and the 2x2 patch expectation matches the
    graded insertion through the oracle."""
    rng = np.random.default_rng(7)
    Lp = leg({-1: 1, 0: 2, 1: 1})
    Lv = leg({-1: 1, 0: 1, 1: 1})
    coords, legt, bonds, order = _patch(2, 2, Lp, Lv)
    ts = {c: _rand_even(rng, "U1", SIG, legt[c]) for c in coords}
    # parity-even diagonal operator (a "number"-like op)
    op = np.diag(rng.standard_normal(4))
    E_op = double_tensor(ts[(0, 0)], op=op)
    Eo = double_tensor_open(ts[(0, 0)])
    E_op2 = jnp.einsum("zs,szuldr->uldr", jnp.asarray(op), Eo)
    assert float(jnp.abs(E_op - E_op2).max()) < 1e-12

    Es = {c: double_tensor(ts[c]) for c in coords}
    norm = _bosonic_patch(2, 2, coords, Es)
    Es[(0, 0)] = E_op
    got = _bosonic_patch(2, 2, coords, Es) / norm

    # graded insertion: op as a graded 2-leg tensor on the phys bond,
    # in-leg dressed with (-1)^p(q_in) — the canonical physical
    # convention (tpeps/groups/fermions.py dress_in, validated against
    # exact Fock computations in test_fermionic.py).  The bosonic
    # pathway trace(rho . op) includes this dressing automatically.
    opg = AbelianTensor("U1", (1, -1), (Lp, Lp), 0,
                        dtype=jnp.complex128, fermionic=True)
    offs = {-1: 0, 0: 1, 1: 3}
    for q, o in offs.items():
        d = 1 if q != 0 else 2
        blk = op[o:o + d, o:o + d] * ((-1.0) ** (abs(q) % 2))
        opg.blocks[(q, q)] = jnp.asarray(blk)
    coordsK = coords
    tensors = ([ts[c] for c in coordsK] + [ts[c].conj() for c in coordsK]
               + [opg])
    # rewire: ket(0,0).s -> op.in(1); op.out(0) -> bra(0,0).s
    bonds2 = []
    for (a, b) in bonds:
        if a == (0, 0) and b == (4, 0):
            bonds2.append(((0, 0), (8, 1)))
            bonds2.append(((8, 0), (4, 0)))
        else:
            bonds2.append((a, b))
    order2 = [(0, 8), (0, 4)] + [(c, c + 4) for c in (1, 2, 3)] + \
        [(0, c) for c in (1, 2, 3)]
    want = complex(_pairwise(tensors, bonds2, order2)) / \
        _oracle(coords, legt, bonds, order, ts)
    assert abs(want - got) < 1e-12 * max(1.0, abs(want))


# ---------------------------------------------------------------- pairs
def _gop(Lp, charge, entries):
    t = AbelianTensor("U1", (1, -1), (Lp, Lp), charge,
                      dtype=jnp.complex128, fermionic=True)
    for key, mat in entries.items():
        t.blocks[key] = jnp.asarray(np.array(mat, dtype=complex))
    return t


def _site_ops(Lp):
    """c/c+ for the two modes (A=u, B=d) in the [vac | u d | ud] basis,
    with the within-site Jordan-Wigner sign on the d mode."""
    cA = _gop(Lp, -1, {(-1, 0): [[1.0, 0.0]], (0, 1): [[0.0], [1.0]]})
    cpA = _gop(Lp, +1, {(0, -1): [[1.0], [0.0]], (1, 0): [[0.0, 1.0]]})
    cB = _gop(Lp, -1, {(-1, 0): [[0.0, 1.0]], (0, 1): [[-1.0], [0.0]]})
    cpB = _gop(Lp, +1, {(0, -1): [[0.0], [1.0]], (1, 0): [[-1.0, 0.0]]})
    return cA, cpA, cB, cpB


def _dense_op(t):
    off = {-1: 0, 0: 1, 1: 3}
    m = np.zeros((4, 4), dtype=complex)
    for (qo, qi), b in t.blocks.items():
        b = np.asarray(b)
        m[off[qo]:off[qo] + b.shape[0], off[qi]:off[qi] + b.shape[1]] = b
    return m


def _oracle_pair(coords, legt, bonds, i, j, ts, G):
    from tpeps.groups.fermions import ordered_pair  # noqa: F401

    KI = {c: k for k, c in enumerate(coords)}
    BI = {c: k + len(coords) for k, c in enumerate(coords)}
    NG = 2 * len(coords)
    tensors = ([ts[c] for c in coords] + [ts[c].conj() for c in coords]
               + [G])
    bonds2 = []
    for (a, b) in bonds:
        if a == (KI[i], 0) and b == (BI[i], 0):
            bonds2.append(((KI[i], 0), (NG, 1)))
            bonds2.append(((NG, 0), (BI[i], 0)))
        elif a == (KI[j], 0) and b == (BI[j], 0):
            bonds2.append(((KI[j], 0), (NG, 3)))
            bonds2.append(((NG, 2), (BI[j], 0)))
        else:
            bonds2.append((a, b))
    order2 = ([(KI[i], NG), (KI[i], BI[i]), (KI[i], KI[j]),
               (KI[i], BI[j])] +
              [(KI[i], KI[c]) for c in coords if c not in (i, j)] +
              [(KI[i], BI[c]) for c in coords if c not in (i, j)])
    return complex(_pairwise(tensors, bonds2, order2))


@pytest.mark.parametrize("gname,i", [("h", (0, 0)), ("v", (0, 0)),
                                     ("diag", (0, 0)), ("anti", (1, 0))])
def test_pair_strings_match_oracle(gname, i):
    """String-dressed open double tensors: the plain bosonic rho
    contraction with a fermionic (parity-odd) operator pair equals the
    graded-network insertion of ``ordered_pair`` exactly (2x2 patch,
    arbitrary random tensors)."""
    from tpeps.ctm.generic.dl_fermi import (
        PAIR_STRINGS, double_tensor_open)
    from tpeps.groups.fermions import ordered_pair

    rng = np.random.default_rng(61)
    Lp = leg({-1: 1, 0: 2, 1: 1})
    Lv = leg({-1: 1, 0: 1, 1: 1})
    off = {"h": (1, 0), "v": (0, 1), "diag": (1, 1), "anti": (-1, 1)}[gname]
    j = (i[0] + off[0], i[1] + off[1])
    coords, legt, bonds, order = _patch(2, 2, Lp, Lv)
    ts = {c: _rand_even(rng, "U1", SIG, legt[c]) for c in coords}
    cA, cpA, cB, cpB = _site_ops(Lp)

    want = _oracle_pair(coords, legt, bonds, i, j, ts,
                        ordered_pair(cB, cpA))

    si_str, sj_str = PAIR_STRINGS[gname]
    Es = {}
    for c in coords:
        st = si_str if c == i else (sj_str if c == j else ())
        Eo = np.asarray(double_tensor_open(ts[c], st))
        Es[c] = Eo if c in (i, j) else np.einsum("ssabcd->abcd", Eo)
    lab = {}

    def bid(k):
        if k not in lab:
            lab[k] = len(lab)
        return lab[k]

    out = [bid(("o", k)) for k in range(4)]
    args = []
    for (x, y) in coords:
        sub = []
        if (x, y) == i:
            sub += [lab[("o", 0)], lab[("o", 1)]]
        elif (x, y) == j:
            sub += [lab[("o", 2)], lab[("o", 3)]]
        sub += [bid(("v", x, y - 1)) if y > 0 else bid(("bu", x, y)),
                bid(("h", x - 1, y)) if x > 0 else bid(("bl", x, y)),
                bid(("v", x, y)) if y < 1 else bid(("bd", x, y)),
                bid(("h", x, y)) if x < 1 else bid(("br", x, y))]
        args += [Es[(x, y)], sub]
    rho = np.einsum(*args, out)
    got = np.einsum("abef,ba,fe->", rho, _dense_op(cB), _dense_op(cpA))
    assert abs(want - got) < 1e-10 * max(1.0, abs(want)), (want, got)


def test_tv_model_dimer_states():
    """End-to-end physics: exact dimer product states through the full
    fermionic dl CTM + TVModel give the hand-computable energy -t1
    (onsite / horizontal / vertical dimers; nA = nB = 1/2).  This pins
    the operator-order and Fock-sign conventions
    (dl_fermi.PAIR_FOCK_SIGN) against first-quantized computations."""
    from tpeps.config import CtmArgs
    from tpeps.models.fermion.tv_model import TVModel

    Lp = leg({-1: 1, 0: 2, 1: 1})
    L2 = leg({0: 1, 1: 1})
    L1 = leg({0: 1})
    s2 = 1 / np.sqrt(2)

    def h_dimer():
        a = AbelianTensor("U1", (1, 1, 1, -1, -1), (Lp, L1, L2, L1, L2), 0,
                          dtype=jnp.complex128, fermionic=True)
        # bond charge 1 <=> the bond fermion sits on A of the right
        # site; the (0,0) entry sign makes the PHYSICAL state the
        # symmetric dimer (checked against exact Fock amplitudes)
        ent = {(1, 1): (0, 0, 1.0), (0, 0): (0, 1, -1.0),
               (1, 0): (1, 0, 1.0), (0, 1): (-1, 0, 1.0)}
        for (ql, qr), (qs, idx, sg) in ent.items():
            key = (qs, 0, ql, 0, qr)
            sh = a.block_shape(key)
            blk = np.zeros(sh, dtype=complex)
            blk[(idx,) + (0,) * (len(sh) - 1)] = s2 * sg
            a.blocks[key] = jnp.asarray(blk)
        return a

    def v_dimer():
        a = AbelianTensor("U1", (1, 1, 1, -1, -1), (Lp, L2, L1, L2, L1), 0,
                          dtype=jnp.complex128, fermionic=True)
        ent = {(1, 1): (0, 0), (0, 0): (0, 1), (0, 1): (1, 0),
               (1, 0): (-1, 0)}
        for (qu, qd), (qs, idx) in ent.items():
            key = (qs, qu, 0, qd, 0)
            sh = a.block_shape(key)
            blk = np.zeros(sh, dtype=complex)
            blk[(idx,) + (0,) * (len(sh) - 1)] = s2
            a.blocks[key] = jnp.asarray(blk)
        return a

    def onsite_dimer():
        a = AbelianTensor("U1", (1, 1, 1, -1, -1), (Lp, L1, L1, L1, L1), 0,
                          dtype=jnp.complex128, fermionic=True)
        blk = np.zeros((2, 1, 1, 1, 1), dtype=complex)
        blk[0, 0, 0, 0, 0] = s2
        blk[1, 0, 0, 0, 0] = s2
        a.blocks[(0, 0, 0, 0, 0)] = jnp.asarray(blk)
        return a

    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-11)
    model = TVModel(t1=1.0)
    for nm, a in [("onsite", onsite_dimer()), ("h", h_dimer()),
                  ("v", v_dimer())]:
        env, _ = model.converge(a, 8, cfg)
        e = model.energy_per_site(a, env)
        obs = model.eval_obs(a, env)
        assert abs(e - (-1.0)) < 1e-9, (nm, e)
        assert abs(obs["nA_(0, 0)"] - 0.5) < 1e-9
        assert abs(obs["nB_(0, 0)"] - 0.5) < 1e-9


def test_corrf_distance_dimer():
    """Fermionic 2-point functions at distance through the dl env
    (dl_fermi.corrf_1sO1sO_h): on the exact horizontal-dimer state the
    physical values are known in closed form: <c_B(0) c^+_A(r)> =
    -1/2 at r=1 (the dimer bond) and 0 beyond; <n_B(0) n_A(r)> = 0 at
    r=1 (same-dimer exclusion) and 1/4 beyond (independent dimers)."""
    from tpeps.config import CtmArgs
    from tpeps.ctm.generic.dl import init_env_dl, run_dl
    from tpeps.ctm.generic.dl_fermi import corrf_1sO1sO_h, double_tensor

    Lp = leg({-1: 1, 0: 2, 1: 1})
    L2 = leg({0: 1, 1: 1})
    L1 = leg({0: 1})
    s2v = 1 / np.sqrt(2)
    a = AbelianTensor("U1", (1, 1, 1, -1, -1), (Lp, L1, L2, L1, L2), 0,
                      dtype=jnp.complex128, fermionic=True)
    ent = {(1, 1): (0, 0, 1.0), (0, 0): (0, 1, -1.0),
           (1, 0): (1, 0, 1.0), (0, 1): (-1, 0, 1.0)}
    for (ql, qr), (qs, idx, sg) in ent.items():
        key = (qs, 0, ql, 0, qr)
        sh = a.block_shape(key)
        blk = np.zeros(sh, dtype=complex)
        blk[(idx,) + (0,) * (len(sh) - 1)] = s2v * sg
        a.blocks[key] = jnp.asarray(blk)

    E = double_tensor(a)
    env, _ = run_dl(E, init_env_dl(E, 8),
                    CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-11))
    cB = np.zeros((4, 4))
    cB[0, 2] = 1
    cB[1, 3] = -1
    cpA = np.zeros((4, 4))
    cpA[1, 0] = 1
    cpA[3, 2] = 1
    vals = np.asarray(corrf_1sO1sO_h(a, env, cB, cpA, 4))
    want = np.array([-0.5, 0.0, 0.0, 0.0])
    assert np.abs(vals - want).max() < 1e-9, vals
    nA = np.diag([0.0, 1, 0, 1])
    nB = np.diag([0.0, 0, 1, 1])
    valsd = np.asarray(corrf_1sO1sO_h(a, env, nB, nA, 4))
    wantd = np.array([0.0, 0.25, 0.25, 0.25])
    assert np.abs(valsd - wantd).max() < 1e-9, valsd


def test_tv_measurement_api_and_factories():
    """The EnvCTM-style measurement surface (measure_1site/measure_nn,
    reference tv_model.py:64-238) against the hand-assembled terms of
    TVModel.energy_per_site on the committed CI state, and the random
    1x1 U(1)/Z2 state factories (reference tv_model.py:529/909) through
    a short dl convergence."""
    import os

    import jax
    import jax.numpy as jnp

    from tpeps.config import CtmArgs
    from tpeps.ctm.generic.dl import init_env_dl, run_dl
    from tpeps.models.fermion import tv_model as tv
    from tpeps.sym.io import read_peps_ad

    jax.config.update("jax_platforms", "cpu")
    path = os.path.join(
        os.environ.get("TPEPS_REFERENCE", "/root/reference"),
        "test-input", "abelian", "CI_D3_1x1_U1_state.json")
    if not os.path.isfile(path):
        import pytest

        pytest.skip("reference test-input not available")

    model = tv.TVModel(t1=1.0, t2=0.7, t3=-0.9, phi=0.35 * np.pi)
    a = read_peps_ad(path).site((0, 0))
    cfg = CtmArgs(ctm_max_iter=60, ctm_conv_tol=1e-9)
    env, _ = model.converge(a, 12, cfg)

    sf = model.sf
    # even pair: <nB nA> on the horizontal bond, against the rho-based value
    r = model._rhos(a, env)
    nrm = model._pair(r["h"], model.I, model.I)
    ref = complex(model._pair(r["h"], model.nB, model.nA) / nrm)
    got = complex(tv.measure_nn(a, env, sf.n("d"), sf.n("u"), geometry="h"))
    assert abs(got - ref) < 1e-12, (got, ref)
    # odd pair: <cB cpA> with automatic string dressing + Fock sign
    ref = complex(tv.PAIR_FOCK_SIGN["h"]
                  * model._pair(r["h_odd"], model.cB, model.cpA) / nrm)
    got = complex(tv.measure_nn(a, env, sf.c("d"), sf.cp("u"), geometry="h"))
    assert abs(got - ref) < 1e-12, (got, ref)
    # 1-site
    rho1 = r["1"]
    ref = complex(jnp.einsum("ab,ba->", rho1, jnp.asarray(model.nA))
                  / jnp.trace(rho1))
    got = complex(tv.measure_1site(a, env, sf.n("u")))
    assert abs(got - ref) < 1e-12, (got, ref)

    # factories: a random U(1) state converges and gives a physical
    # density; the Z2 state (different phys-basis ordering) converges
    # with a positive norm RDM
    st = tv.random_1x1_state_U1({-1: 1, 0: 1, 1: 1}, key=5)
    ar = st.site((0, 0))
    E = tv.double_tensor(ar)
    envr, _ = run_dl(E, init_env_dl(E, 8), cfg)
    val = complex(tv.measure_1site(ar, envr, sf.n("u")))
    assert np.isfinite(val.real)
    assert -1e-6 < val.real < 1 + 1e-6, val

    from tpeps.ctm.generic.dl import rdm1x1_dl
    from tpeps.ctm.generic.dl_fermi import double_tensor_open

    stz = tv.random_1x1_state_Z2({0: 1, 1: 1}, key=5)
    az = stz.site((0, 0))
    Ez = tv.double_tensor(az)
    envz, _ = run_dl(Ez, init_env_dl(Ez, 8), cfg)
    rho = rdm1x1_dl(double_tensor_open(az), envz)
    assert float(jnp.abs(jnp.trace(rho))) > 0


def test_cell_same_tensor_matches_1x1():
    """Multi-cell fermionic plumbing: a [[0,1]] cell whose two sites
    hold the SAME tensor must reproduce the 1x1 dl engine's
    measurements exactly (all geometries, even + odd pairs) — this
    certifies the coordinate-general RDMs, string placement and Fock
    signs of the cell path against the oracle-anchored 1x1 path."""
    from tpeps.config import CtmArgs
    from tpeps.ctm.generic.dl import init_env_dl, run_dl
    from tpeps.models.fermion import tv_model as tv

    model = tv.TVModel(t1=1.0, t2=0.5, t3=-0.3, phi=0.2 * np.pi)
    st1 = tv.random_1x1_state_U1({-1: 1, 0: 1, 1: 1}, key=11)
    a = st1.site((0, 0))
    cfg = CtmArgs(ctm_max_iter=120, ctm_conv_tol=1e-12)
    E = tv.double_tensor(a)
    env1, _ = run_dl(E, init_env_dl(E, 8), cfg)
    st2 = tv.pattern_state("U1", [[0, 1]], {0: a, 1: a})
    env2, _ = model.converge_cell(st2, 8, cfg)

    sf = model.sf
    for op in (sf.n("u"), sf.n("d")):
        want = complex(tv.measure_1site(a, env1, op))
        for c in ((0, 0), (1, 0)):
            got = complex(tv.measure_1site_cell(st2, env2, op, coord=c))
            assert abs(got - want) < 1e-8, (c, got, want)
    pairs = [(sf.n("d"), sf.n("u")), (sf.c("d"), sf.cp("u")),
             (sf.c("u"), sf.cp("u"))]
    for g in ("h", "v", "diag", "anti"):
        for op0, op1 in pairs:
            want = complex(tv.measure_nn(a, env1, op0, op1, geometry=g))
            for c in ((0, 0), (1, 0)):
                got = complex(tv.measure_nn_cell(
                    st2, env2, op0, op1, coord=c, geometry=g))
                assert abs(got - want) < 1e-8, (g, c, got, want)
    e1 = float(model.energy_per_site(a, env1))
    e2 = float(model.energy_per_site_cell(st2, env2))
    assert abs(e1 - e2) < 1e-8, (e1, e2)


def test_state_2x1_exact_observables():
    """The deterministic 2x1 seed (|1100> + |0110>)/sqrt(2) per cell
    (reference tv_model.py:488 ``state_2x1``) is an exact product of
    4-mode cell states - every observable is hand-computable:
    densities (1/2, 1, 1/2, 0), intra-cell <nB0 nA1> = 1/2, intra-cell
    hopping magnitude 1/2, inter-cell density correlation 1/4 and
    inter-cell hopping 0."""
    from tpeps.config import CtmArgs
    from tpeps.models.fermion import tv_model as tv

    st = tv.state_2x1()
    model = tv.TVModel(t1=1.0)
    cfg = CtmArgs(ctm_max_iter=80, ctm_conv_tol=1e-12)
    env, _ = model.converge_cell(st, 6, cfg)
    sf = model.sf

    for c, (na, nb) in {(0, 0): (0.5, 1.0), (1, 0): (0.5, 0.0)}.items():
        va = complex(tv.measure_1site_cell(st, env, sf.n("u"), coord=c))
        vb = complex(tv.measure_1site_cell(st, env, sf.n("d"), coord=c))
        assert abs(va - na) < 1e-9, (c, va, na)
        assert abs(vb - nb) < 1e-9, (c, vb, nb)

    # intra-cell bond (0,0)-(1,0)
    v = complex(tv.measure_nn_cell(st, env, sf.n("d"), sf.n("u"),
                                   coord=(0, 0), geometry="h"))
    assert abs(v - 0.5) < 1e-9, v
    hop = complex(tv.measure_nn_cell(st, env, sf.c("u"), sf.cp("u"),
                                     coord=(0, 0), geometry="h"))
    assert abs(abs(hop) - 0.5) < 1e-9, hop
    # inter-cell bond (1,0)-(2,0): independent cells
    v = complex(tv.measure_nn_cell(st, env, sf.n("u"), sf.n("u"),
                                   coord=(1, 0), geometry="h"))
    assert abs(v - 0.25) < 1e-9, v
    hop = complex(tv.measure_nn_cell(st, env, sf.c("u"), sf.cp("u"),
                                     coord=(1, 0), geometry="h"))
    assert abs(hop) < 1e-9, hop


def test_multicell_random_factories_smoke():
    """The pattern-based random factories (reference tv_model.py:
    564-1131) produce consistent multi-site cells that converge through
    the dl cell engine with physical densities."""
    from tpeps.config import CtmArgs
    from tpeps.models.fermion import tv_model as tv

    model = tv.TVModel(t1=1.0)
    cfg = CtmArgs(ctm_max_iter=40, ctm_conv_tol=1e-9)
    st = tv.random_checkerboard_state_U1({-1: 1, 0: 1, 1: 1}, key=3)
    assert len(st.sites) == 2 and (st.lX, st.lY) == (2, 2)
    assert st.vertexToSite((1, 0)) == st.vertexToSite((0, 1))
    env, _ = model.converge_cell(st, 6, cfg)
    for c in ((0, 0), (1, 0)):
        v = complex(tv.measure_1site_cell(st, env, model.sf.n("u"), coord=c))
        assert np.isfinite(v.real)
        assert -1e-6 < v.real < 1 + 1e-6, (c, v)
    # pattern bookkeeping of the remaining factories
    st = tv.random_3x3_state_Z2({0: 1, 1: 1}, key=1)
    assert len(st.sites) == 3 and (st.lX, st.lY) == (3, 3)
    assert st.vertexToSite((2, 1)) == st.vertexToSite((0, 0))
    st = tv.random_3x3_9_state_U1({-1: 1, 0: 1, 1: 1}, key=1)
    assert len(st.sites) == 9
    st = tv.random_1x6_state_U1({-1: 1, 0: 1, 1: 1}, key=1)
    assert (st.lX, st.lY) == (6, 1)


def test_ipess_state_factory():
    """The honeycomb-iPESS factory (reference tv_model.py:946-1006):
    a deterministic |10> product-state pair anchors the graded
    contraction + fusion + basis reorder exactly; a random state lands
    in the standard Z2 physical-leg convention and converges through
    the dl engine."""
    from tpeps.config import CtmArgs
    from tpeps.ctm.generic.dl import init_env_dl, rdm1x1_dl, run_dl
    from tpeps.ctm.generic.dl_fermi import double_tensor_open
    from tpeps.models.fermion import tv_model as tv
    from tpeps.sym.tensor import AbelianTensor, leg

    import jax.numpy as jnp

    # --- deterministic anchor: A holds n_a=1, B holds n_b=0 on trivial
    # aux legs -> the site must be the |10> product state, i.e. one
    # block in the odd sector with the amplitude at standard position 1
    # (odd-sector order [|01>, |10>])
    aux = leg({0: 1, 1: 1})
    p2 = leg({0: 1, 1: 1})
    A = AbelianTensor.zeros("Z2", (-1, 1, -1, 1, 1),
                            (aux, aux, aux, p2, leg({1: 1}, pshift=1)),
                            n=0, fermionic=True)
    A.blocks[(0, 0, 0, 1, 1)] = jnp.ones((1, 1, 1, 1, 1))
    A = A.fuse_pair(3)
    B = AbelianTensor.zeros("Z2", (1, -1, 1, 1), (aux, aux, aux, p2),
                            n=0, fermionic=True)
    B.blocks[(0, 0, 0, 0)] = jnp.ones((1, 1, 1, 1))
    a10 = tv.ipess_site(A, B)
    assert a10.signature == (1, 1, 1, -1, -1)
    assert a10.legs[0].pshift == 1
    nz = {q: b for q, b in a10.blocks.items() if float(jnp.abs(b).max()) > 0}
    assert set(nz) == {(0, 0, 0, 0, 0)}, set(nz)
    blk = np.asarray(nz[(0, 0, 0, 0, 0)]).reshape(2)
    assert abs(blk[0]) < 1e-14 and abs(abs(blk[1]) - 1.0) < 1e-14, blk

    # --- random state: standard phys-leg convention + dl convergence
    st = tv.random_ipess_state({0: 2, 1: 2}, key=7)
    a = st.site((0, 0))
    ref_leg = tv.random_1x1_state_Z2({0: 1, 1: 1}, key=0).site((0, 0)).legs[0]
    assert a.legs[0].dims == ref_leg.dims and a.legs[0].pshift == ref_leg.pshift
    assert a.n == 0 and abs(float(a.norm()) - 1.0) < 1e-12
    assert all(l.dims == {0: 2, 1: 2} for l in a.legs[1:])
    cfg = CtmArgs(ctm_max_iter=40, ctm_conv_tol=1e-9)
    E = tv.double_tensor(a)
    env, _ = run_dl(E, init_env_dl(E, 8), cfg)
    rho = rdm1x1_dl(double_tensor_open(a), env)
    assert float(jnp.abs(jnp.trace(rho))) > 0
