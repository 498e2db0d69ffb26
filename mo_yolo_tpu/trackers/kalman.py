"""Kalman filter for box tracking (constant-velocity, XYAH state).

Equivalent of the reference `KalmanFilterXYAH` (`trackers/utils/
kalman_filter.py:11`): 8-d state (x, y, aspect, h, velocities), measurement
noise scaled by box height — the standard SORT-family filter, as batched
numpy.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class KalmanFilterXYAH:
    def __init__(self):
        ndim, dt = 4, 1.0
        self._F = np.eye(2 * ndim)
        for i in range(ndim):
            self._F[i, ndim + i] = dt
        self._H = np.eye(ndim, 2 * ndim)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def initiate(self, measurement: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """measurement [4] xyah -> (mean [8], covariance [8,8])."""
        mean = np.concatenate([measurement, np.zeros(4)])
        h = measurement[3]
        std = np.array([
            2 * self._std_weight_position * h, 2 * self._std_weight_position * h,
            1e-2, 2 * self._std_weight_position * h,
            10 * self._std_weight_velocity * h, 10 * self._std_weight_velocity * h,
            1e-5, 10 * self._std_weight_velocity * h])
        return mean, np.diag(std ** 2)

    def predict(self, mean, cov):
        h = mean[3]
        std_pos = [self._std_weight_position * h] * 2 + [1e-2,
                   self._std_weight_position * h]
        std_vel = [self._std_weight_velocity * h] * 2 + [1e-5,
                   self._std_weight_velocity * h]
        Q = np.diag(np.square(np.concatenate([std_pos, std_vel])))
        mean = self._F @ mean
        cov = self._F @ cov @ self._F.T + Q
        return mean, cov

    def project(self, mean, cov):
        h = mean[3]
        std = np.array([self._std_weight_position * h,
                        self._std_weight_position * h, 1e-1,
                        self._std_weight_position * h])
        R = np.diag(std ** 2)
        return self._H @ mean, self._H @ cov @ self._H.T + R

    def update(self, mean, cov, measurement):
        pm, pc = self.project(mean, cov)
        K = np.linalg.solve(pc.T, (cov @ self._H.T).T).T
        innov = measurement - pm
        mean = mean + K @ innov
        cov = cov - K @ pc @ K.T
        return mean, cov

    def gating_distance(self, mean, cov, measurements: np.ndarray) -> np.ndarray:
        """Squared Mahalanobis distance to each measurement [n,4]."""
        pm, pc = self.project(mean, cov)
        d = measurements - pm
        L = np.linalg.cholesky(pc)
        z = np.linalg.solve(L, d.T)
        return np.sum(z * z, axis=0)
