"""Sketch comparison helper classes (API parity: reference
`src/sourmash/sketchcomparison.py` — FracMinHashComparison:99,
NumMinHashComparison:82). Thin orchestration over MinHash operations; all the
heavy set math happens in the batched device ops underneath."""

from __future__ import annotations

from dataclasses import dataclass

from .minhash import MinHash


@dataclass
class BaseMinHashComparison:
    "Comparison state for a pair of MinHashes at a common num/scaled."

    mh1: MinHash
    mh2: MinHash
    ignore_abundance: bool = False
    jaccard_ani_untrustworthy: bool = False

    def downsample_and_handle_ignore_abundance(self, cmp_num=None, cmp_scaled=None):
        if self.ignore_abundance:
            self.mh1_cmp = self.mh1.flatten()
            self.mh2_cmp = self.mh2.flatten()
        else:
            self.mh1_cmp = self.mh1
            self.mh2_cmp = self.mh2
        if cmp_scaled is not None:
            self.mh1_cmp = self.mh1_cmp.downsample(scaled=cmp_scaled)
            self.mh2_cmp = self.mh2_cmp.downsample(scaled=cmp_scaled)
        elif cmp_num is not None:
            self.mh1_cmp = self.mh1_cmp.downsample(num=cmp_num)
            self.mh2_cmp = self.mh2_cmp.downsample(num=cmp_num)
        else:
            raise ValueError("Error: must pass in a comparison scaled or num value.")

    def check_compatibility_and_downsample(self, cmp_num=None, cmp_scaled=None):
        if not any(
            [(self.mh1.num and self.mh2.num), (self.mh1.scaled and self.mh2.scaled)]
        ):
            raise TypeError("Error: Both sketches must be 'num' or 'scaled'.")
        self.downsample_and_handle_ignore_abundance(
            cmp_num=cmp_num, cmp_scaled=cmp_scaled
        )
        if not self.mh1_cmp.is_compatible(self.mh2_cmp):
            raise TypeError("Error: Cannot compare incompatible sketches.")
        self.ksize = self.mh1.ksize
        self.moltype = self.mh1.moltype

    @property
    def intersect_mh(self):
        return self.mh1_cmp.flatten().intersection(self.mh2_cmp.flatten())

    @property
    def jaccard(self):
        return self.mh1_cmp.jaccard(self.mh2_cmp)

    def estimate_jaccard_ani(self, jaccard=None):
        jinfo = self.mh1_cmp.jaccard_ani(self.mh2_cmp, jaccard=jaccard)
        self.jaccard_ani = jinfo.ani
        if jinfo.p_exceeds_threshold:
            self.potential_false_negative = True
        self.jaccard_ani_untrustworthy = jinfo.je_exceeds_threshold

    @property
    def angular_similarity(self):
        return self.mh1_cmp.angular_similarity(self.mh2_cmp)

    @property
    def cosine_similarity(self):
        return self.angular_similarity


@dataclass
class NumMinHashComparison(BaseMinHashComparison):
    "Comparison between two num minhashes."

    cmp_num: int = None

    def __post_init__(self):
        if self.cmp_num is None:
            self.cmp_num = min(self.mh1.num, self.mh2.num)
        self.check_compatibility_and_downsample(cmp_num=self.cmp_num)

    @property
    def size_may_be_inaccurate(self):
        return False


@dataclass
class FracMinHashComparison(BaseMinHashComparison):
    "Comparison between two scaled (FracMinHash) sketches."

    cmp_scaled: int = None
    threshold_bp: int = 0
    estimate_ani_ci: bool = False
    ani_confidence: float = 0.95

    def __post_init__(self):
        if self.cmp_scaled is None:
            self.cmp_scaled = max(self.mh1.scaled, self.mh2.scaled)
        self.check_compatibility_and_downsample(cmp_scaled=self.cmp_scaled)
        self.potential_false_negative = False

    @property
    def pass_threshold(self):
        return self.total_unique_intersect_hashes >= self.threshold_bp

    @property
    def size_may_be_inaccurate(self):
        return bool(
            not self.mh1_cmp.size_is_accurate() or not self.mh2_cmp.size_is_accurate()
        )

    @property
    def total_unique_intersect_hashes(self):
        "~ intersect_bp (hash count × scaled; no (k-1) bp correction)."
        return len(self.intersect_mh) * self.cmp_scaled

    @property
    def mh1_containment_in_mh2(self):
        return self.mh1_cmp.contained_by(self.mh2_cmp)

    def estimate_ani_from_mh1_containment_in_mh2(self, containment=None):
        m1_cani = self.mh1_cmp.containment_ani(
            self.mh2_cmp,
            containment=containment,
            confidence=self.ani_confidence,
            estimate_ci=self.estimate_ani_ci,
        )
        self.ani_from_mh1_containment_in_mh2 = m1_cani.ani
        if m1_cani.p_exceeds_threshold:
            self.potential_false_negative = True
        if self.estimate_ani_ci:
            self.ani_from_mh1_containment_in_mh2_low = m1_cani.ani_low
            self.ani_from_mh1_containment_in_mh2_high = m1_cani.ani_high

    @property
    def mh2_containment_in_mh1(self):
        return self.mh2_cmp.contained_by(self.mh1_cmp)

    def estimate_ani_from_mh2_containment_in_mh1(self, containment=None):
        m2_cani = self.mh2_cmp.containment_ani(
            self.mh1_cmp,
            containment=containment,
            confidence=self.ani_confidence,
            estimate_ci=self.estimate_ani_ci,
        )
        self.ani_from_mh2_containment_in_mh1 = m2_cani.ani
        if m2_cani.p_exceeds_threshold:
            self.potential_false_negative = True
        if self.estimate_ani_ci:
            self.ani_from_mh2_containment_in_mh1_low = m2_cani.ani_low
            self.ani_from_mh2_containment_in_mh1_high = m2_cani.ani_high

    @property
    def max_containment(self):
        return self.mh1_cmp.max_containment(self.mh2_cmp)

    def estimate_max_containment_ani(self, max_containment=None):
        mc_ani_info = self.mh1_cmp.max_containment_ani(
            self.mh2_cmp,
            max_containment=max_containment,
            confidence=self.ani_confidence,
            estimate_ci=self.estimate_ani_ci,
        )
        self.max_containment_ani = mc_ani_info.ani
        if mc_ani_info.p_exceeds_threshold:
            self.potential_false_negative = True
        if self.estimate_ani_ci:
            self.max_containment_ani_low = mc_ani_info.ani_low
            self.max_containment_ani_high = mc_ani_info.ani_high

    @property
    def avg_containment(self):
        return self.mh1_cmp.avg_containment(self.mh2_cmp)

    @property
    def avg_containment_ani(self):
        "Average containment ANI; sets potential_false_negative internally."
        self.estimate_ani_from_mh1_containment_in_mh2()
        self.estimate_ani_from_mh2_containment_in_mh1()
        a1 = self.ani_from_mh1_containment_in_mh2
        a2 = self.ani_from_mh2_containment_in_mh1
        if a1 is None or a2 is None:
            return None
        return (a1 + a2) / 2

    def estimate_all_containment_ani(self):
        "Estimate all containment ANI values."
        self.estimate_ani_from_mh1_containment_in_mh2()
        self.estimate_ani_from_mh2_containment_in_mh1()
        a1 = self.ani_from_mh1_containment_in_mh2
        a2 = self.ani_from_mh2_containment_in_mh1
        if a1 is None or a2 is None:
            self.max_containment_ani = None
        else:
            self.max_containment_ani = max([a1, a2])

    def weighted_intersection(self, from_mh=None, from_abundD={}):
        "Intersection hashes carrying abundances from from_mh/from_abundD."
        abund_mh = self.intersect_mh.copy_and_clear()
        abund_mh.track_abundance = True
        if from_mh is not None and from_mh.track_abundance:
            from_abundD = from_mh.hashes
        if from_abundD:
            # hashes absent from the abundance source get abundance 1
            abunds = {k: from_abundD.get(k, 1) for k in self.intersect_mh.hashes}
            abund_mh.set_abundances(abunds)
            return abund_mh
        return self.intersect_mh
