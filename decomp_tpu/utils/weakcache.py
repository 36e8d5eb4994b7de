"""Self-evicting compile caches keyed by loader identity.

The fused streaming epochs (nmf / dictionary learning, single-device and
sharded) are jitted closures TRACED THROUGH a user loader callable, so
their compile cache must be keyed by loader identity. A plain
``functools.lru_cache`` (the original implementation) holds that key —
and, through the built epoch's closure and jaxpr constants, every
device array the loader captures — STRONGLY for the process lifetime:
dropping a loader that captured a multi-GB resident dataset did not
free its HBM until 32 other loaders had pushed it out.

``LoaderKeyedCache`` keeps the ``lru_cache`` ergonomics (bounded size,
``cache_info()`` with hits/misses) while holding loaders weakly:

- The cache entry stores ``weakref.ref`` holders, and the built epoch
  receives weak SHIMS to trace through, so no strong path from cache to
  loader exists (the same discipline as ``nmf_streaming._bf16_wrap``).
- When the user drops the loader, the weakref callback evicts the whole
  entry — including the jitted epoch whose trace cache pins the
  loader's captured arrays as jaxpr constants.
- Callables that do not support weak references (rare; e.g. some C
  extension callables) are held strongly, matching the old behaviour.

A shim only resolves its weakref while an epoch is being (re)traced,
and every ``solve_streaming`` holds its loader argument alive for the
duration of the call, so a live call can never observe a dead ref.
"""

import weakref
from collections import OrderedDict
from typing import Any, Callable, NamedTuple, Optional, Sequence


class EpochCacheInfo(NamedTuple):
    hits: int
    misses: int
    maxsize: int
    currsize: int


def _make_shim(ref: "weakref.ref") -> Callable:
    def shim(*args, **kwargs):
        loader = ref()
        if loader is None:  # pragma: no cover - caller dropped the loader
            raise RuntimeError(
                "a loader behind a cached streaming epoch was garbage-"
                "collected while the epoch was being traced; keep the "
                "loader alive for the duration of solve_streaming")
        return loader(*args, **kwargs)

    return shim


class LoaderKeyedCache:
    """Bounded loader-identity cache of built epochs.

    ``get(loaders, geom_key, build)``: ``loaders`` is a tuple of
    callables (entries may be None), ``geom_key`` any hashable geometry
    descriptor, and ``build(*shims)`` constructs the epoch from
    weak-resolving stand-ins for the loaders (same call signatures).
    """

    def __init__(self, maxsize: int = 32):
        self._entries = OrderedDict()
        self._hits = 0
        self._misses = 0
        self._maxsize = int(maxsize)

    def cache_info(self) -> EpochCacheInfo:
        currsize = sum(len(e["epochs"]) for e in self._entries.values())
        return EpochCacheInfo(self._hits, self._misses, self._maxsize,
                              currsize)

    def cache_clear(self) -> None:
        self._entries.clear()
        self._hits = 0
        self._misses = 0

    @staticmethod
    def _alive(holder, loader) -> bool:
        if loader is None:
            return holder is None
        if holder is None:
            return False
        kind, ref = holder
        target = ref() if kind == "w" else ref
        # identity, not equality: equal-but-distinct callables (e.g.
        # fresh bound methods) have distinct captures and lifetimes
        return target is loader

    def get(self, loaders: Sequence[Optional[Callable]], geom_key: Any,
            build: Callable) -> Any:
        ids = tuple(None if ldr is None else id(ldr) for ldr in loaders)
        ent = self._entries.get(ids)
        if ent is not None and all(
                self._alive(h, ldr)
                for h, ldr in zip(ent["holders"], loaders)):
            fn = ent["epochs"].get(geom_key)
            if fn is not None:
                self._hits += 1
                self._entries.move_to_end(ids)
                return fn
        else:
            holders, shims = [], []
            for ldr in loaders:
                if ldr is None:
                    holders.append(None)
                    shims.append(None)
                    continue
                try:
                    ref = weakref.ref(
                        ldr,
                        lambda _r, _k=ids: self._entries.pop(_k, None))
                    holders.append(("w", ref))
                    shims.append(_make_shim(ref))
                except TypeError:
                    holders.append(("s", ldr))
                    shims.append(ldr)
            ent = {"holders": holders, "shims": shims,
                   "epochs": {}}
            self._entries[ids] = ent
        self._misses += 1
        fn = build(*ent["shims"])
        ent["epochs"][geom_key] = fn
        self._entries.move_to_end(ids)
        # Bound the total number of built epochs (the lru_cache cap this
        # replaces): evict least-recent ENTRIES, never the one just used.
        while (sum(len(e["epochs"]) for e in self._entries.values())
               > self._maxsize and len(self._entries) > 1):
            self._entries.popitem(last=False)
        return fn
