"""Cluster-scanner interface (capability parity: reference
``postprocessing/clusterscanner.py``): validation-time hooks that cluster the
condensation space and accumulate figures of merit."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any


class ClusterScanner(ABC):
    """Base class for cluster scanners (reference ``clusterscanner.py:9-31``)."""

    @abstractmethod
    def __call__(self, data, out: dict[str, Any], i_batch: int) -> None: ...

    def reset(self) -> None:
        pass

    def get_foms(self) -> dict[str, Any]:
        return {}


class CombinedClusterScanner(ClusterScanner):
    """Fan out to multiple scanners (reference ``clusterscanner.py:34-53``)."""

    def __init__(self, scanners: list[ClusterScanner]):
        self._scanners = scanners

    def __call__(self, *args, **kwargs) -> None:
        for scanner in self._scanners:
            scanner(*args, **kwargs)

    def reset(self) -> None:
        for scanner in self._scanners:
            scanner.reset()

    def get_foms(self) -> dict[str, Any]:
        foms: dict[str, Any] = {}
        for scanner in self._scanners:
            foms |= scanner.get_foms()
        return foms
