"""Vector-set service facade.

Replaces the surface the reference exports to the Garnet server over C FFI
(`diskann-garnet/src/lib.rs:222-835`: create_index / drop_index / insert /
remove / search_vector / search_element / set_attribute / card, serving the
Redis `VADD`/`VSIM` vector-set commands).  Here the host is Python, so the
surface is a small in-process registry of named dynamic indexes with
element-name <-> internal-id mapping and per-element attributes — the same
contract a serving layer would bind to.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.graph.index import GraphIndex
from diskann_tpu.ops.distance import Metric


class VectorSet:
    """One named collection (the `VADD`/`VSIM` target)."""

    def __init__(self, dim: int, config: GraphConfig | None = None, **kw):
        self.index = GraphIndex(dim, config, **kw)
        self.name_to_id: dict[str, int] = {}
        self.id_to_name: dict[int, str] = {}
        self.attributes: dict[str, Any] = {}

    # VADD
    def add(self, name: str, vector, attribute: Any = None) -> bool:
        if name in self.name_to_id:
            return False  # reference semantics: element ids are unique
        (iid,) = self.index.insert(np.asarray(vector, np.float32)[None])
        self.name_to_id[name] = int(iid)
        self.id_to_name[int(iid)] = name
        if attribute is not None:
            self.attributes[name] = attribute
        return True

    # VREM
    def remove(self, name: str) -> bool:
        iid = self.name_to_id.pop(name, None)
        if iid is None:
            return False
        self.id_to_name.pop(iid, None)
        self.attributes.pop(name, None)
        self.index.delete([iid])
        return True

    # VSIM with a query vector
    def search_vector(self, vector, k: int = 10, *, l_search: int | None = None):
        d, ids, _ = self.index.search(
            np.asarray(vector, np.float32)[None], k=k, l_search=l_search
        )
        return [
            (self.id_to_name[int(i)], float(dd))
            for i, dd in zip(ids[0], d[0])
            if int(i) in self.id_to_name
        ]

    # VSIM with an element name
    def search_element(self, name: str, k: int = 10, **kw):
        iid = self.name_to_id[name]
        vec = np.asarray(self.index.state.vectors[iid])
        out = self.search_vector(vec, k + 1, **kw)
        return [(n, d) for n, d in out if n != name][:k]

    def set_attribute(self, name: str, attribute: Any) -> bool:
        if name not in self.name_to_id:
            return False
        self.attributes[name] = attribute
        return True

    def get_attribute(self, name: str) -> Any:
        return self.attributes.get(name)

    # CARD
    def card(self) -> int:
        return len(self.name_to_id)


class VectorService:
    """Named-index registry (create_index / drop_index / ...)."""

    def __init__(self):
        self._sets: dict[str, VectorSet] = {}

    def create_index(
        self, name: str, dim: int, *, metric: str = "l2",
        max_degree: int = 32, l_build: int = 64, **kw,
    ) -> VectorSet:
        if name in self._sets:
            raise KeyError(f"index {name!r} exists")
        cfg = GraphConfig(
            max_degree=max_degree, l_build=l_build, metric=Metric(metric)
        )
        vs = VectorSet(dim, cfg, **kw)
        self._sets[name] = vs
        return vs

    def drop_index(self, name: str) -> bool:
        return self._sets.pop(name, None) is not None

    def get(self, name: str) -> VectorSet:
        return self._sets[name]

    def names(self) -> list[str]:
        return sorted(self._sets)
