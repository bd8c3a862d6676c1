"""Missing-ansatz coverage: IPEPS_LC_BP (site+bond LC),
IPEPS_TRGL_1S_TTPHYS_PG (split trivalent triangular) and IPEPO.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpeps.config import CtmArgs
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ipeps.ipeps import IPEPO, IPEPS
from tpeps.ipeps.ipeps_lc_bp import IPEPS_LC_BP
from tpeps.ipeps.ipeps_trgl_pg import IPEPS_TRGL_1S_TTPHYS_PG
from tpeps.models.j1j2 import J1J2
from tpeps.su2sym.gen import import_sym_bonds, import_sym_tensors


def test_lc_bp_builds_and_contracts():
    """Site+bond ansatz on the D=3 SU(2) basis: build the bipartite
    cell, converge CTM, evaluate the Heisenberg energy."""
    D = 3
    site = [({"meta": {"pg": "A_1"}}, t) for _, t in import_sym_tensors(2, D, "A1")]
    bond = [({"meta": {"pg": "A_1"}}, g) for _, g in import_sym_bonds(D)]
    coeffs = {"site": jnp.asarray([1.0, 0.5]),
              "bond": jnp.asarray([1.0] * len(bond))}
    st = IPEPS_LC_BP({"site": site, "bond": bond}, coeffs)
    assert len(st.sites) == 2
    # bond identity limit: with b = identity the two sublattices coincide
    gid = jnp.eye(D)
    idx = None
    # express identity in the bond basis: eps blocks are not identity, so
    # instead check B = dressed A reproduces A when we bypass the basis
    st2 = IPEPS_LC_BP({"site": site, "bond": [({"meta": {}}, gid)]},
                      {"site": coeffs["site"], "bond": jnp.asarray([1.0])})
    A, B = st2.sites[(0, 0)], st2.sites[(1, 0)]
    assert float(jnp.abs(A - B).max()) < 1e-13

    norm = {c: a / jnp.linalg.norm(a) for c, a in st.sites.items()}
    stn = IPEPS(norm, vertexToSite=st.vertexToSite, lX=2, lY=2)
    env = init_env(stn, 12, "CTMRG")
    env, _ = run(stn, env, CtmArgs(ctm_max_iter=30, ctm_conv_tol=1e-8))
    model = J1J2(j1=1.0)
    e = float(model.energy_2x2_2site(stn, env))
    assert np.isfinite(e)


def test_trgl_pg_symmetrization():
    D, d = 2, 2
    rng = np.random.RandomState(0)
    t_aux = jnp.asarray(rng.rand(D, D, D) - 0.5)
    t_phys = jnp.asarray(rng.rand(D, D, D, d) - 0.5)
    st = IPEPS_TRGL_1S_TTPHYS_PG(t_aux, t_phys, pgs={"t_aux": "A_1", "t_phys": "A_1"},
                                 pg_symmetrize=True)
    ta = st.elem_tensors["t_aux"]
    tp = st.elem_tensors["t_phys"]
    assert float(jnp.abs(ta - ta.transpose(1, 0, 2)).max()) < 1e-13
    assert float(jnp.abs(tp - tp.transpose(0, 2, 1, 3)).max()) < 1e-13
    a = st.site((0, 0))
    assert a.shape == (d, D, D, D, D)
    # functional update rebuilds the on-site tensor
    st2 = st.set_parameters({"t_aux": 2.0 * ta, "t_phys": tp})
    assert float(jnp.abs(st2.site((0, 0)) - 2.0 * a).max()) < 1e-12


def test_ipepo_identity_layer():
    """IPEPO from the identity operator fuses back to a state whose
    norm network equals the original state's (purification sanity)."""
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.rand(2, 2, 2, 2, 2) - 0.5)
    st = IPEPS({(0, 0): A}, lX=1, lY=1)
    op = jnp.eye(2)
    po = IPEPO.from_operator_product(op, st)
    assert po.site((0, 0)).shape == (2, 2, 2, 2, 2, 2)
    fused = po.to_ipeps()
    assert fused.site((0, 0)).shape == (4, 2, 2, 2, 2)
    # <psi|psi> from the fused purification == <psi|psi> of the state:
    # both double layers coincide for op = identity
    dl1 = jnp.einsum("suldr,szabc->ualzdbrc", A, jnp.conj(A))
    F = fused.site((0, 0))
    dl2 = jnp.einsum("suldr,szabc->ualzdbrc", F, jnp.conj(F))
    assert float(jnp.abs(dl1 - dl2).max()) < 1e-13
