"""CTMRG observables of an SU(2)-invariant C4v LC state for J1-J2
(counterpart of reference examples/su2_c4v/ctmrg_j1j2_su2_c4v.py):

    python examples/su2_c4v/ctmrg_j1j2_su2_c4v.py --instate <lc_state.json> \\
        --chi 27 --corrf_r 10 --top_n 4 [--corrf_dd_v] [--top2]

Converges the C4v environment of the state, prints energy + one-site
observables, spin-spin and horizontal (optionally vertical) dimer-dimer
correlation functions, the corner spectrum and the leading transfer
operator spectrum (optionally of the width-2 channel).
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import tpeps  # noqa: F401
import jax.numpy as jnp

from lc_common import build_basis, init_coeffs, site_of_coeffs  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.ctm.c4v.ctmrg import run_fixed_point
from tpeps.ctm.c4v.env import init_env
from tpeps.ctm.c4v.transferops import get_Top2_spec_c4v, get_Top_spec_c4v
from tpeps.models import j1j2

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--pg", type=str, default="A1")
parser.add_argument("--corrf_r", type=int, default=1)
parser.add_argument("--top_n", type=int, default=2)
parser.add_argument("--corrf_dd_v", action="store_true")
parser.add_argument("--top2", action="store_true")
args, unknown_args = parser.parse_known_args()

ENERGY_ATTR = "energy_1x1_lowmem"


def main():
    cfg = configure(args)
    model = j1j2.J1J2_C4V_BIPARTITE(j1=args.j1, j2=args.j2,
                                    dtype=cfg.global_args.jnp_dtype)
    energy_f = getattr(model, ENERGY_ATTR)
    elem = build_basis(cfg, pg=args.pg)
    a = site_of_coeffs(elem, init_coeffs(cfg, elem))

    env0 = init_env(a, cfg.main.chi, cfg.ctm.ctm_env_init_type)
    env, n_iter, dist, _ = run_fixed_point(
        a=a, env=env0, max_iter=cfg.ctm.ctm_max_iter,
        conv_tol=cfg.ctm.ctm_conv_tol)
    print(f"converged in {int(n_iter)} iters, dist={float(dist):.3e}")

    e = float(energy_f(a, env))
    obs_values, obs_labels = model.eval_obs(a, env)
    print(", ".join(["epoch", "energy"] + obs_labels))
    print(", ".join(["FINAL", f"{e}"] + [str(v) for v in obs_values]))

    corrSS = model.eval_corrf_SS(a, env, args.corrf_r)
    print("\nSS r " + " ".join(corrSS.keys()))
    for i in range(args.corrf_r):
        print(f"{i} " + " ".join(f"{float(corrSS[k][i])}" for k in corrSS))

    corrDD = model.eval_corrf_DD_H(a, env, args.corrf_r)
    print("\nDD r " + " ".join(corrDD.keys()))
    for i in range(args.corrf_r):
        print(f"{i} " + " ".join(f"{float(corrDD[k][i])}" for k in corrDD))

    if args.corrf_dd_v:
        corrDDV = model.eval_corrf_DD_V(a, env, args.corrf_r)
        print("\nDD_v r " + " ".join(corrDDV.keys()))
        for i in range(args.corrf_r):
            print(f"{i} " + " ".join(f"{float(corrDDV[k][i])}" for k in corrDDV))

    print("\nspectrum(C)")
    s = np.linalg.svd(np.asarray(env.C), compute_uv=False)
    for i in range(min(args.chi, s.size)):
        print(f"{i} {s[i]}")

    print("\nspectrum(T)")
    l = np.asarray(get_Top_spec_c4v(args.top_n, a, env))
    for i in range(l.shape[0]):
        print(f"{i} {l[i, 0]} {l[i, 1]}")

    if args.top2:
        print("\nspectrum(T2)")
        l2 = np.asarray(get_Top2_spec_c4v(args.top_n, a, env))
        for i in range(l2.shape[0]):
            print(f"{i} {l2[i, 0]} {l2[i, 1]}")
    return e


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestCtmrgSU2LC(unittest.TestCase):
    """Measure the pure occupation-(1,3) D=3 A1 tensor (coefficients
    (1, 0)) — the global optimum of the real-A1 D=3 ray family; its
    chi=16 energy is the calibrated -0.5910 (see optim_j1j2_su2_c4v.py
    calibration note) and the dimer-dimer correlator must be finite and
    consistent between the horizontal and width-2 vertical channels at
    r=0 (C4v symmetry)."""

    def test_ctmrg_su2_lc_d3(self):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        from tpeps.ipeps.ipeps_lc import IPEPS_LC_1SITE_PG
        from tpeps.su2sym.gen import import_sym_tensors

        # write the (1, 0) LC state and measure it through --instate
        elem = [({"meta": {"pg": "A_1"}}, t)
                for _, t in import_sym_tensors(2, 3, pg="A1")]
        st = IPEPS_LC_1SITE_PG(elem, {(0, 0): jnp.asarray([1.0, 0.0])})
        st.write_to_file("TEST_su2lc_in_state.json")

        args.instate = "TEST_su2lc_in_state.json"
        args.instate_noise = 0.0
        args.bond_dim = 3
        args.chi = 16
        args.j2 = 0.0
        args.seed = 0
        args.corrf_r = 2
        args.corrf_dd_v = True
        args.top2 = True
        try:
            e = main()
        finally:
            args.instate = None
            os.remove("TEST_su2lc_in_state.json")
        assert abs(e - (-0.5910)) < 5e-3, e
