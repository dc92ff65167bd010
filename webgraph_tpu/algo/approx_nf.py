"""Combining repeated HyperBall runs (reference analog:
ApproximateNeighbourhoodFunctions.java:34): pointwise combination and
jackknife estimation of derived statistics (CDF, average distance, harmonic
diameter, spid)."""

from __future__ import annotations

import numpy as np

from webgraph_tpu.algo.nf import NeighbourhoodFunction


class ApproximateNeighbourhoodFunctions:
    @staticmethod
    def combine(runs: list[np.ndarray]) -> np.ndarray:
        """Pointwise average of several NF runs (padded with their last
        value, reference: combine)."""
        L = max(len(r) for r in runs)
        padded = np.stack([np.concatenate([r, np.full(L - len(r), r[-1])]) for r in runs])
        return padded.mean(axis=0)

    @staticmethod
    def evaluate(runs: list[np.ndarray], statistic) -> tuple[float, float]:
        """Jackknife estimate (value, standard error) of a statistic over
        runs (reference: compute, :131). ``statistic`` maps an NF array to a
        float; built-ins live on :class:`Evaluator`."""
        k = len(runs)
        if k < 2:
            return float(statistic(ApproximateNeighbourhoodFunctions.combine(runs))), float("nan")
        full = statistic(ApproximateNeighbourhoodFunctions.combine(runs))
        loo = np.array(
            [
                statistic(ApproximateNeighbourhoodFunctions.combine(runs[:i] + runs[i + 1 :]))
                for i in range(k)
            ]
        )
        jk = k * full - (k - 1) * loo.mean()
        se = np.sqrt((k - 1) / k * ((loo - loo.mean()) ** 2).sum())
        return float(jk), float(se)


class Evaluator:
    """The reference's evaluator choices (CDF handled elementwise)."""

    AVERAGE_DISTANCE = staticmethod(NeighbourhoodFunction.average_distance)
    SPID = staticmethod(NeighbourhoodFunction.spid)

    @staticmethod
    def EFFECTIVE_DIAMETER(nf, alpha: float = 0.9):
        return NeighbourhoodFunction.effective_diameter(nf, alpha)

    @staticmethod
    def HARMONIC_DIAMETER(nf):
        """n(n-1) / sum of inverse distances, from NF increments."""
        nf = np.asarray(nf, dtype=np.float64)
        n = nf[0]
        inc = np.diff(nf)
        inv_sum = float((inc / np.arange(1, len(nf))).sum())
        return n * (n - 1) / inv_sum if inv_sum else float("inf")
