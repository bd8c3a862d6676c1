"""SGD with momentum + derivative-free line search.

Counterpart of reference optim/sgd_modified.py:169-260 (``SGD_MOD.step_2c``)
and its driver ad_optim_sgd_mod.py, in the same functional flat-parameter
style as :class:`tpeps.optim.lbfgs.LBFGS`.
"""

from __future__ import annotations

import numpy as np

from .lbfgs import backtracking


class SGD:
    """Two-closure SGD (reference sgd_modified.py:11-260)."""

    def __init__(self, lr=1.0, momentum=0.0, dampening=0.0, weight_decay=0.0,
                 nesterov=False, line_search_fn=None, line_search_eps=1.0e-8,
                 max_iter: int = 1):
        self.lr = lr
        self.momentum = momentum
        self.dampening = dampening
        self.weight_decay = weight_decay
        self.nesterov = nesterov
        self.line_search_fn = line_search_fn
        self.line_search_eps = line_search_eps
        self.max_iter = max_iter
        self._momentum_buffer = None

    def state_dict(self):
        return {"momentum_buffer": self._momentum_buffer}

    def load_state_dict(self, sd, **kwargs):
        self._momentum_buffer = sd.get("momentum_buffer")

    def step_2c(self, x0: np.ndarray, closure, closure_linesearch=None):
        """One epoch of (up to ``max_iter``) SGD steps.

        :param closure: ``x -> (loss, grad)``
        :param closure_linesearch: ``x -> loss`` (derivative-free), used
            by the backtracking line search
        :return: ``(x, loss, grad, info)`` mirroring LBFGS.step_2c
        """
        x = np.asarray(x0, dtype=np.float64).copy()
        loss, flat_grad = closure(x)
        info = {"ls_evals": [], "alpha": []}

        for _ in range(self.max_iter):
            d_p = np.array(flat_grad)
            if self.weight_decay != 0:
                d_p += self.weight_decay * x
            if self.momentum != 0:
                if self._momentum_buffer is None:
                    self._momentum_buffer = d_p.copy()
                else:
                    self._momentum_buffer = (
                        self.momentum * self._momentum_buffer
                        + (1 - self.dampening) * d_p
                    )
                d_p = (d_p + self.momentum * self._momentum_buffer
                       if self.nesterov else self._momentum_buffer)

            d = -d_p
            gtd = float(np.dot(flat_grad, d))
            if self.line_search_fn == "backtracking":
                assert closure_linesearch is not None, \
                    "backtracking requires a line-search closure"
                f_new, t, n_evals = backtracking(
                    lambda t_: closure_linesearch(x + t_ * d),
                    self.lr, d, loss, gtd,
                )
                if t == 0.0:
                    info["ls_failed"] = True
                    break
            elif self.line_search_fn is None or self.line_search_fn == "default":
                t, n_evals = self.lr, 0
            else:
                raise RuntimeError(f"unsupported line search {self.line_search_fn}")

            x = x + t * d
            loss, flat_grad = closure(x)
            info["ls_evals"].append(n_evals + 1)
            info["alpha"].append(t)
        return x, loss, flat_grad, info
