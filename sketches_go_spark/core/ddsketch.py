"""DDSketch value object — the mergeable quantile sketch, numpy-backed.

Semantics match the reference (cited for parity, not copied):

- add / 3-way value routing (pos store / neg store / zero bucket), NaN and
  out-of-range rejection:       /root/reference/ddsketch/ddsketch.go:124-145
- quantile rank convention ``rank = q*(count-1)`` and the
  negative / zero / positive branch:  ddsketch.go:166-191
- KeyAtRank = smallest index with cumulative count > rank (rank clamped at 0):
  /root/reference/ddsketch/store/dense_store.go:153-165
- merge = bucket-wise count addition gated on mapping equality:
  ddsketch.go:302-310
- collapsing-lowest/highest bounded-memory stores:
  /root/reference/ddsketch/store/collapsing_lowest_dense_store.go:102-166,
  collapsing_highest_dense_store.go (mirror)
- exact summary statistics with Kahan-compensated sum:
  /root/reference/ddsketch/stat/summary.go:81-151
- exact-stats quantile clamped into [min, max]: ddsketch.go:614-639

Layout is deliberately NOT the reference's (dense array / paginated buffers —
single-process allocator concerns).  Bins live as two parallel sorted numpy
arrays ``(indexes int64, counts float64)`` per sign, which vectorizes
cumulative-sum quantile extraction and makes merge an O(n) sorted union; in
Spark the same triple is a fixed StructType row (see functions.ddsketch_fns).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace

import numpy as np

from sketches_go_spark.core.mapping import (
    LOGARITHMIC,
    _BaseMapping,
    mapping_from_alpha,
    mapping_from_params,
)

COLLAPSE_NONE = "none"
COLLAPSE_LOWEST = "lowest"
COLLAPSE_HIGHEST = "highest"

_EMPTY_IDX = np.empty(0, dtype=np.int64)
_EMPTY_CNT = np.empty(0, dtype=np.float64)


class UntrackableValueError(ValueError):
    """Raised in strict mode for NaN or out-of-range inputs
    (reference errors: ddsketch.go:21-24)."""


@dataclass(frozen=True)
class DDSketchConfig:
    """Sketch configuration: relative accuracy + store bounding policy.

    ``max_bins=0`` means unbounded (reference LogUnboundedDenseDDSketch,
    ddsketch.go:86-92); otherwise each of the positive / negative stores
    holds at most ``max_bins`` buckets and collapses per ``collapse``
    (ddsketch.go:98-116).
    """

    alpha: float = 0.01
    max_bins: int = 0
    collapse: str = COLLAPSE_NONE
    interpolation: str = LOGARITHMIC

    def __post_init__(self) -> None:
        if self.collapse not in (COLLAPSE_NONE, COLLAPSE_LOWEST, COLLAPSE_HIGHEST):
            raise ValueError(f"bad collapse mode {self.collapse!r}")
        if self.collapse != COLLAPSE_NONE and self.max_bins <= 0:
            raise ValueError("collapsing store requires max_bins > 0")

    def mapping(self) -> _BaseMapping:
        return mapping_from_alpha(self.alpha, self.interpolation)


def _agg_bins(idx: np.ndarray, cnt: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Aggregate (index, count) pairs into sorted unique bins."""
    if idx.size == 0:
        return _EMPTY_IDX, _EMPTY_CNT
    uidx, inv = np.unique(idx, return_inverse=True)
    ucnt = np.bincount(inv, weights=cnt)
    return uidx.astype(np.int64), ucnt.astype(np.float64)


def _collapse(
    idx: np.ndarray, cnt: np.ndarray, max_bins: int, mode: str
) -> tuple[np.ndarray, np.ndarray]:
    """Bound a store to ``max_bins`` buckets.

    Batch-equivalent of the reference's incremental collapse
    (collapsing_lowest_dense_store.go:102-136): with the full bin multiset
    known, collapsing-lowest folds every bucket below ``max_index - m + 1``
    into that boundary bucket (mirror for highest).  The reference's
    *incremental* result is arrival-order dependent; only the invariants
    (exact total count, <= m bins, preserved max for lowest / min for highest)
    are guaranteed, and those are what tests assert (store_test.go:561-685).
    """
    if max_bins <= 0 or idx.size <= max_bins:
        return idx, cnt
    if mode == COLLAPSE_LOWEST:
        lo = idx[-1] - max_bins + 1
        return _agg_bins(np.maximum(idx, lo), cnt)
    if mode == COLLAPSE_HIGHEST:
        hi = idx[0] + max_bins - 1
        return _agg_bins(np.minimum(idx, hi), cnt)
    return idx, cnt


def _kahan_add(sum_: float, comp: float, value: float) -> tuple[float, float]:
    """One Kahan-Babuška compensated-summation step (stat/summary.go:114-119)."""
    tmp = value - comp
    t = sum_ + tmp
    comp = t - sum_ - tmp
    return t, comp


@dataclass
class DDSketch:
    """A mergeable DDSketch with always-on exact summary statistics.

    Mutable accumulator object (mirrors the reference API shape); all bulk
    operations are numpy-vectorized.  Use :meth:`from_values` for batch build.
    """

    config: DDSketchConfig = field(default_factory=DDSketchConfig)
    mapping: _BaseMapping = None  # type: ignore[assignment]
    pos_idx: np.ndarray = field(default_factory=lambda: _EMPTY_IDX)
    pos_cnt: np.ndarray = field(default_factory=lambda: _EMPTY_CNT)
    neg_idx: np.ndarray = field(default_factory=lambda: _EMPTY_IDX)
    neg_cnt: np.ndarray = field(default_factory=lambda: _EMPTY_CNT)
    zero_count: float = 0.0
    # exact summary statistics (stat/summary.go:16-23); sum is Kahan-compensated
    exact_count: float = 0.0
    exact_sum: float = 0.0
    _sum_compensation: float = 0.0
    exact_min: float = math.inf
    exact_max: float = -math.inf

    def __post_init__(self) -> None:
        if self.mapping is None:
            self.mapping = self.config.mapping()

    # ------------------------------------------------------------------ build
    @classmethod
    def from_values(
        cls,
        values,
        counts=None,
        config: DDSketchConfig | None = None,
        on_untrackable: str = "raise",
    ) -> "DDSketch":
        s = cls(config=config or DDSketchConfig())
        s.add(values, counts, on_untrackable=on_untrackable)
        return s

    def add(self, values, counts=None, on_untrackable: str = "raise") -> "DDSketch":
        """Vectorized AddWithCount (ddsketch.go:124-145).

        ``on_untrackable``: 'raise' mirrors the reference's per-value errors;
        'ignore' drops NaN / out-of-range values (the distributed path uses
        'ignore' plus a job-level rejected-row metric — you cannot throw
        per-row from a vectorized kernel).
        """
        v = np.atleast_1d(np.asarray(values, dtype=np.float64))
        c = (
            np.ones_like(v)
            if counts is None
            else np.atleast_1d(np.asarray(counts, dtype=np.float64))
        )
        if v.shape != c.shape:
            raise ValueError("values and counts must have the same shape")
        if np.any(c < 0):
            raise UntrackableValueError("negative count")

        m = self.mapping
        nan = np.isnan(v)
        too_high = v > m.max_indexable
        too_low = v < -m.max_indexable
        if on_untrackable == "raise":
            if nan.any():
                raise UntrackableValueError("NaN is untrackable")
            if too_high.any():
                raise UntrackableValueError("value too high to be tracked")
            if too_low.any():
                raise UntrackableValueError("value too low to be tracked")
        else:
            keep = ~(nan | too_high | too_low)
            v, c = v[keep], c[keep]

        # drop zero-count entries early (they must not affect min/max either:
        # reference Add with count 0 is a no-op on the stores but not on
        # min/max; we match the stores-and-stats behavior for count>0 rows)
        nz = c > 0
        v, c = v[nz], c[nz]
        if v.size == 0:
            return self

        pos = v > m.min_indexable
        neg = v < -m.min_indexable
        zero = ~(pos | neg)

        if pos.any():
            pi, pc = _agg_bins(m.index(v[pos]), c[pos])
            self.pos_idx, self.pos_cnt = _merge_sorted_bins(
                self.pos_idx, self.pos_cnt, pi, pc
            )
        if neg.any():
            ni, nc = _agg_bins(m.index(-v[neg]), c[neg])
            self.neg_idx, self.neg_cnt = _merge_sorted_bins(
                self.neg_idx, self.neg_cnt, ni, nc
            )
        self.zero_count += float(c[zero].sum())
        self._apply_collapse()

        # exact stats
        self.exact_count += float(c.sum())
        # batch partial sum via numpy pairwise summation, folded in with Kahan
        self.exact_sum, self._sum_compensation = _kahan_add(
            self.exact_sum, self._sum_compensation, float(np.dot(v, c))
        )
        self.exact_min = min(self.exact_min, float(v.min()))
        self.exact_max = max(self.exact_max, float(v.max()))
        return self

    def _apply_collapse(self) -> None:
        cfg = self.config
        if cfg.collapse == COLLAPSE_NONE:
            return
        self.pos_idx, self.pos_cnt = _collapse(
            self.pos_idx, self.pos_cnt, cfg.max_bins, cfg.collapse
        )
        self.neg_idx, self.neg_cnt = _collapse(
            self.neg_idx, self.neg_cnt, cfg.max_bins, cfg.collapse
        )

    # ------------------------------------------------------------------ merge
    def merge(self, other: "DDSketch") -> "DDSketch":
        """Bucket-wise merge; mapping equality gate (ddsketch.go:302-310)."""
        if not self.mapping.equals(other.mapping):
            raise ValueError("cannot merge sketches with different index mappings")
        self.pos_idx, self.pos_cnt = _merge_sorted_bins(
            self.pos_idx, self.pos_cnt, other.pos_idx, other.pos_cnt
        )
        self.neg_idx, self.neg_cnt = _merge_sorted_bins(
            self.neg_idx, self.neg_cnt, other.neg_idx, other.neg_cnt
        )
        self.zero_count += other.zero_count
        self._apply_collapse()
        # exact-stats merge (stat/summary.go:101-112): fold other's sum and
        # compensation through this sketch's compensated accumulator
        self.exact_count += other.exact_count
        self.exact_sum, self._sum_compensation = _kahan_add(
            self.exact_sum, self._sum_compensation, other.exact_sum
        )
        self.exact_sum, self._sum_compensation = _kahan_add(
            self.exact_sum, self._sum_compensation, other._sum_compensation
        )
        self.exact_min = min(self.exact_min, other.exact_min)
        self.exact_max = max(self.exact_max, other.exact_max)
        return self

    def copy(self) -> "DDSketch":
        return replace(
            self,
            pos_idx=self.pos_idx.copy(),
            pos_cnt=self.pos_cnt.copy(),
            neg_idx=self.neg_idx.copy(),
            neg_cnt=self.neg_cnt.copy(),
        )

    # ---------------------------------------------------------------- queries
    @property
    def count(self) -> float:
        """Total count = zero + positive + negative (ddsketch.go:208-210)."""
        return self.zero_count + float(self.pos_cnt.sum()) + float(self.neg_cnt.sum())

    @property
    def is_empty(self) -> bool:
        return self.count == 0

    def quantile(self, q: float, clamp_exact: bool = False) -> float:
        return self.quantiles([q], clamp_exact=clamp_exact)[0]

    def quantiles(self, qs, clamp_exact: bool = False) -> np.ndarray:
        """GetValuesAtQuantiles (ddsketch.go:166-205), vectorized over qs.

        ``clamp_exact=True`` reproduces DDSketchWithExactSummaryStatistics:
        estimates are clamped into the exact [min, max] (ddsketch.go:614-639).
        """
        qs = np.asarray(qs, dtype=np.float64)
        if np.any((qs < 0) | (qs > 1)):
            raise ValueError("quantile must be between 0 and 1")
        total = self.count
        if total == 0:
            raise ValueError("empty sketch")

        # one cumulative order: negatives (descending index), zero, positives
        neg_cum = np.cumsum(self.neg_cnt)
        pos_cum = np.cumsum(self.pos_cnt)
        neg_total = float(neg_cum[-1]) if neg_cum.size else 0.0

        ranks = qs * (total - 1)  # ddsketch.go:181 (rank convention)
        out = np.empty_like(ranks)
        for i, rank in enumerate(ranks):
            if rank < neg_total:
                # reversed rank into the negative store (ddsketch.go:184-185)
                r = max(neg_total - 1 - rank, 0.0)
                k = min(np.searchsorted(neg_cum, r, side="right"), self.neg_idx.size - 1)
                out[i] = -self.mapping.value_scalar(int(self.neg_idx[k]))
            elif rank < neg_total + self.zero_count:
                out[i] = 0.0
            else:
                r = max(rank - self.zero_count - neg_total, 0.0)
                k = min(np.searchsorted(pos_cum, r, side="right"), self.pos_idx.size - 1)
                out[i] = self.mapping.value_scalar(int(self.pos_idx[k]))
        if clamp_exact:
            out = np.clip(out, self.exact_min, self.exact_max)
        return out

    def min_approx(self) -> float:
        """GetMinValue from extreme buckets (ddsketch.go:243-256)."""
        if self.neg_idx.size:
            return -self.mapping.value_scalar(int(self.neg_idx[-1]))
        if self.zero_count > 0:
            return 0.0
        if self.pos_idx.size:
            return self.mapping.value_scalar(int(self.pos_idx[0]))
        raise ValueError("empty sketch")

    def max_approx(self) -> float:
        """GetMaxValue (ddsketch.go:226-239)."""
        if self.pos_idx.size:
            return self.mapping.value_scalar(int(self.pos_idx[-1]))
        if self.zero_count > 0:
            return 0.0
        if self.neg_idx.size:
            return -self.mapping.value_scalar(int(self.neg_idx[0]))
        raise ValueError("empty sketch")

    def sum_approx(self) -> float:
        """GetSum = sum over bins of value*count (ddsketch.go:261-267)."""
        s = 0.0
        if self.pos_idx.size:
            s += float(np.dot(self.mapping.value(self.pos_idx), self.pos_cnt))
        if self.neg_idx.size:
            s -= float(np.dot(self.mapping.value(self.neg_idx), self.neg_cnt))
        return s

    @property
    def sum(self) -> float:
        """Exact compensated sum (stat/summary.go:62-71)."""
        return self.exact_sum + self._sum_compensation

    # ---------------------------------------------------------------- reshape
    def reweight(self, w: float) -> "DDSketch":
        """Scale every count by w > 0; distribution-invariant
        (ddsketch.go:514-529, stat/summary.go:123-134)."""
        if w <= 0:
            raise ValueError("can't reweight by a negative or zero factor")
        self.pos_cnt = self.pos_cnt * w
        self.neg_cnt = self.neg_cnt * w
        self.zero_count *= w
        self.exact_count *= w
        self.exact_sum *= w
        self._sum_compensation *= w
        return self

    def change_mapping(
        self, new_mapping: _BaseMapping, scale_factor: float = 1.0
    ) -> "DDSketch":
        """Re-bucket onto a new mapping, splitting each old bucket's interval
        proportionally (by overlap) across new buckets (ddsketch.go:483-510).

        Needed to merge sketches built with different alphas.  Returns a new
        sketch; exact stats are rescaled by ``scale_factor``.
        """
        out = DDSketch(
            config=replace(
                self.config,
                alpha=new_mapping.relative_accuracy(),
                interpolation=new_mapping.interpolation,
            ),
            mapping=new_mapping,
        )
        out.zero_count = self.zero_count
        for sign, idx, cnt in (
            (+1, self.pos_idx, self.pos_cnt),
            (-1, self.neg_idx, self.neg_cnt),
        ):
            if idx.size == 0:
                continue
            lo = self.mapping.lower_bound(idx) * scale_factor
            hi = self.mapping.lower_bound(idx + 1) * scale_factor
            new_idx_parts: list[np.ndarray] = []
            new_cnt_parts: list[np.ndarray] = []
            ilo = new_mapping.index(lo)
            ihi = new_mapping.index(np.nextafter(hi, -np.inf))
            width = hi - lo
            for j in range(idx.size):
                rng = np.arange(ilo[j], ihi[j] + 1, dtype=np.int64)
                if rng.size == 1:
                    new_idx_parts.append(rng)
                    new_cnt_parts.append(np.asarray([cnt[j]]))
                    continue
                bounds = new_mapping.lower_bound(np.arange(ilo[j], ihi[j] + 2))
                overlap = np.minimum(bounds[1:], hi[j]) - np.maximum(bounds[:-1], lo[j])
                overlap = np.clip(overlap, 0, None)
                new_idx_parts.append(rng)
                new_cnt_parts.append(cnt[j] * overlap / width[j])
            ni, nc = _agg_bins(
                np.concatenate(new_idx_parts), np.concatenate(new_cnt_parts)
            )
            if sign > 0:
                out.pos_idx, out.pos_cnt = ni, nc
            else:
                out.neg_idx, out.neg_cnt = ni, nc
        out._apply_collapse()
        out.exact_count = self.exact_count
        out.exact_sum = self.exact_sum * scale_factor
        out._sum_compensation = self._sum_compensation * scale_factor
        if scale_factor >= 0:
            out.exact_min = self.exact_min * scale_factor
            out.exact_max = self.exact_max * scale_factor
        else:
            out.exact_min = self.exact_max * scale_factor
            out.exact_max = self.exact_min * scale_factor
        return out

    # ------------------------------------------------------------ serde (row)
    def to_dict(self) -> dict:
        """Plain-python dict matching the Spark sketch StructType
        (functions.ddsketch_fns.SKETCH_SCHEMA)."""
        return {
            "gamma": float(self.mapping.gamma),
            "index_offset": float(self.mapping.index_offset),
            "interpolation": self.mapping.interpolation,
            "max_bins": int(self.config.max_bins),
            "collapse": self.config.collapse,
            "zero_count": float(self.zero_count),
            "pos_idx": [int(i) for i in self.pos_idx],
            "pos_cnt": [float(x) for x in self.pos_cnt],
            "neg_idx": [int(i) for i in self.neg_idx],
            "neg_cnt": [float(x) for x in self.neg_cnt],
            "xcount": float(self.exact_count),
            "xsum": float(self.sum),
            "xmin": float(self.exact_min),
            "xmax": float(self.exact_max),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "DDSketch":
        mp = mapping_from_params(d["interpolation"], d["gamma"], d["index_offset"])
        cfg = DDSketchConfig(
            alpha=mp.relative_accuracy(),
            max_bins=int(d["max_bins"]),
            collapse=d["collapse"],
            interpolation=d["interpolation"],
        )
        s = cls(config=cfg, mapping=mp)
        s.pos_idx = np.asarray(d["pos_idx"], dtype=np.int64)
        s.pos_cnt = np.asarray(d["pos_cnt"], dtype=np.float64)
        s.neg_idx = np.asarray(d["neg_idx"], dtype=np.int64)
        s.neg_cnt = np.asarray(d["neg_cnt"], dtype=np.float64)
        s.zero_count = float(d["zero_count"])
        s.exact_count = float(d["xcount"])
        s.exact_sum = float(d["xsum"])
        s._sum_compensation = 0.0
        s.exact_min = float(d["xmin"])
        s.exact_max = float(d["xmax"])
        return s


def _merge_sorted_bins(
    idx1: np.ndarray, cnt1: np.ndarray, idx2: np.ndarray, cnt2: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Union of two sorted bin arrays with count addition (store merge,
    dense_store.go:167-186 semantics, sparse layout)."""
    if idx1.size == 0:
        return idx2, cnt2
    if idx2.size == 0:
        return idx1, cnt1
    return _agg_bins(np.concatenate([idx1, idx2]), np.concatenate([cnt1, cnt2]))
