"""J1-J2 with the SU(2)-invariant C4v LC ansatz, MESH-PARALLEL
finite-difference gradients and the TILED low-memory RDM energy path
(counterpart of reference
examples/su2_c4v/optim_j1j2_su2_c4v_FD_tiled_dist.py, which spawns
torch.distributed/gloo workers exchanging displacements point-to-point;
here the displacement wave shards one-per-device over a jax.sharding
Mesh with zero communication until the gather —
tpeps/parallel/sharded.py fd_grad_sharded):

    python examples/su2_c4v/optim_j1j2_su2_c4v_FD_tiled_dist.py \\
        --bond_dim 3 --chi 27

On a single chip the wave degenerates to the vmap-batched FD of
optim_j1j2_su2_c4v_FD.py; on a pod slice each displacement evaluates on
its own device.
"""

import os
import sys
import unittest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import tpeps  # noqa: F401

from lc_common import build_basis, finalize, init_coeffs, make_loss  # noqa: E402
from tpeps.config import configure, get_args_parser
from tpeps.models import j1j2
from tpeps.optim.fd import optimize_state_fd
from tpeps.parallel.sharded import fd_grad_sharded, make_mesh

parser = get_args_parser()
parser.add_argument("--j1", type=float, default=1.0)
parser.add_argument("--j2", type=float, default=0.0)
parser.add_argument("--pg", type=str, default="A1")
parser.add_argument("--n_devices", type=int, default=None,
                    help="mesh size (default: all visible devices)")
args, unknown_args = parser.parse_known_args()


def main():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    cfg = configure(args)
    model = j1j2.J1J2_C4V_BIPARTITE(j1=args.j1, j2=args.j2,
                                    dtype=cfg.global_args.jnp_dtype)
    elem = build_basis(cfg, pg=args.pg)
    params = {"c": init_coeffs(cfg, elem)}
    loss_fn = make_loss(cfg, model.energy_1x1_tiled, elem)

    n_dev = args.n_devices or len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("fd",))
    print(f"FD wave over {n_dev} device(s)")
    fd_grad = fd_grad_sharded(mesh, loss_fn, params, fd_eps=cfg.opt.fd_eps)

    params, history = optimize_state_fd(params, loss_fn, cfg=cfg,
                                        fd_grad_fn=fd_grad)
    return finalize(cfg, model, model.energy_1x1_tiled, elem, params)


if __name__ == "__main__":
    if unknown_args:
        raise Exception("Unknown command line arguments: " + str(unknown_args))
    main()


class TestOptimSU2LCFDTiledDist(unittest.TestCase):
    def test_opt_su2_lc_d3_fd_tiled_dist(self):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        args.bond_dim = 3
        args.chi = 16
        args.j2 = 0.0
        args.opt_max_iter = 6
        args.seed = 4
        args.out_prefix = "RESULT_test_su2lc_fdtd"
        e = main()
        assert e < -0.58, e
        f = args.out_prefix + "_state.json"
        if os.path.exists(f):
            os.remove(f)
