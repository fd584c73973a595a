"""Shared experiment/scene state + field-watch events.

Equivalent of ``wisp/framework/state.py`` + ``event.py`` (reference):
dataclass state shared between trainer / renderer / logger components, with
an observer mechanism (`watch`) replacing the pydispatch dependency.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List


class Watchable:
    """Attribute-change notifications (ref @watchedfields + watch())."""

    def __init__(self):
        object.__setattr__(self, '_watchers', {})

    def __setattr__(self, name, value):
        object.__setattr__(self, name, value)
        for cb in self._watchers.get(name, []):
            cb(self, name, value)

    def watch(self, fieldname: str, callback: Callable):
        self._watchers.setdefault(fieldname, []).append(callback)


class OptimizationState(Watchable):
    """ref WispState.optimization (epoch/iteration/losses/metrics)."""

    def __init__(self):
        super().__init__()
        self.running = False
        self.epoch = 0
        self.iteration = 0
        self.iterations_per_epoch = 0
        self.elapsed_time = 0.0
        self.losses: Dict[str, List[float]] = {}
        self.metrics: Dict[str, List[float]] = {}

    def log(self, **kv):
        for k, v in kv.items():
            target = self.losses if 'loss' in k else self.metrics
            target.setdefault(k, []).append(float(v))


class SceneState(Watchable):
    """ref WispState.graph: named objects visible to viewers/loggers."""

    def __init__(self):
        super().__init__()
        self.objects: Dict[str, Any] = {}

    def add(self, name: str, obj: Any):
        self.objects[name] = obj


class WispState(Watchable):
    """Top-level shared state (ref WispState)."""

    def __init__(self):
        super().__init__()
        self.optimization = OptimizationState()
        self.graph = SceneState()
        self.extras: Dict[str, Any] = {}
