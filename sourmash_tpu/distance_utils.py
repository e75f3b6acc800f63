"""Jaccard/containment → evolutionary distance (ANI) estimation.

Implements the mutation-rate interval model of Blanca et al. / the
KoslickiLab mutation-rate-ci-calculator (doi:10.1101/2022.01.11.475870), with
API parity to reference `src/sourmash/distance_utils.py` (ANIResult:44,
containment_to_distance:258, jaccard_to_distance:349).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from math import exp, log, sqrt

from scipy.optimize import brentq
from scipy.stats import binom
from scipy.stats import norm as _norm

from .logging import notify


def check_distance(dist):
    if not 0 <= dist <= 1:
        raise ValueError(f"Error: distance value {dist :.4f} is not between 0 and 1!")
    return dist


def check_prob_threshold(val, threshold=1e-3):
    "Likelihood of sharing no hashes by chance alone; flag if > threshold."
    return val, bool(threshold is not None and val > threshold)


def check_jaccard_error(val, threshold=1e-4):
    return val, bool(threshold is not None and val > threshold)


@dataclass
class ANIResult:
    "distance/ANI point estimate from k-mer containment."

    dist: float
    p_nothing_in_common: float
    p_threshold: float = 1e-3
    size_is_inaccurate: bool = False
    p_exceeds_threshold: bool = field(init=False)

    def check_dist_and_p_threshold(self):
        self.dist = check_distance(self.dist)
        self.p_nothing_in_common, self.p_exceeds_threshold = check_prob_threshold(
            self.p_nothing_in_common, self.p_threshold
        )

    def __post_init__(self):
        self.check_dist_and_p_threshold()

    @property
    def ani(self):
        if self.size_is_inaccurate:
            return None
        return 1 - self.dist


@dataclass
class jaccardANIResult(ANIResult):
    "distance/ANI from jaccard; carries the jaccard approximation error."

    jaccard_error: float = None
    je_threshold: float = 1e-4

    def __post_init__(self):
        self.check_dist_and_p_threshold()
        if self.jaccard_error is None:
            raise ValueError("Error: jaccard_error cannot be None.")
        self.jaccard_error, self.je_exceeds_threshold = check_jaccard_error(
            self.jaccard_error, self.je_threshold
        )

    @property
    def ani(self):
        if self.je_exceeds_threshold or self.size_is_inaccurate:
            return None
        return 1 - self.dist


@dataclass
class ciANIResult(ANIResult):
    "distance/ANI from containment, with confidence intervals."

    dist_low: float = None
    dist_high: float = None

    def __post_init__(self):
        self.check_dist_and_p_threshold()
        if self.dist_low is not None and self.dist_high is not None:
            self.dist_low = check_distance(self.dist_low)
            self.dist_high = check_distance(self.dist_high)

    @property
    def ani_low(self):
        if self.dist_high is None or self.size_is_inaccurate:
            return None
        return 1 - self.dist_high

    @property
    def ani_high(self):
        if self.dist_low is None or self.size_is_inaccurate:
            return None
        return 1 - self.dist_low


def r1_to_q(k, r1):
    "Per-k-mer mutation probability q from per-base rate r1."
    return float(1 - (1 - float(r1)) ** k)


def exp_n_mutated(L, k, r1):
    return L * r1_to_q(k, r1)


def var_n_mutated(L, k, r1, *, q=None):
    "Variance of the number of mutated k-mers (Blanca et al. eq. set)."
    if r1 == 0:
        return 0.0
    r1 = float(r1)
    if q is None:
        q = r1_to_q(k, r1)
    varN = (
        L * (1 - q) * (q * (2 * k + (2 / r1) - 1) - 2 * k)
        + k * (k - 1) * (1 - q) ** 2
        + (2 * (1 - q) / (r1**2)) * ((1 + (k - 1) * (1 - q)) * r1 - q)
    )
    if varN < 0.0:
        raise ValueError("Error: varN <0.0!")
    return float(varN)


def exp_n_mutated_squared(L, k, p):
    return var_n_mutated(L, k, p) + exp_n_mutated(L, k, p) ** 2


def probit(p):
    return _norm.ppf(p)


def handle_seqlen_nkmers(ksize, *, sequence_len_bp=None, n_unique_kmers=None):
    if n_unique_kmers is not None:
        return n_unique_kmers
    if sequence_len_bp is None:
        raise ValueError(
            "Error: distance estimation requires input of either 'sequence_len_bp' or 'n_unique_kmers'"
        )
    return sequence_len_bp - (ksize - 1)


def set_size_chernoff(set_size, scaled, *, relative_error=0.05):
    "Chernoff bound on sketch-size estimation accuracy (deprecated)."
    return 1 - 2 * exp(-(relative_error**2) * set_size / (scaled * 3))


def set_size_exact_prob(set_size, scaled, *, relative_error=0.05):
    """Exact binomial probability that sketch_size*scaled estimates set_size
    within relative_error (reference `distance_utils.py:196-218`)."""
    hi = set_size / scaled * (relative_error + 1)
    lo = -set_size / scaled * (relative_error - 1)
    p = 1 / scaled
    prob = binom.cdf(hi, set_size, p) - binom.cdf(lo, set_size, p)
    if lo == int(lo):
        prob += binom.pmf(lo, set_size, p)
    return prob


def get_expected_log_probability(n_unique_kmers, ksize, mutation_rate, scaled_fraction):
    "(L - E[N_mut]) * log(1 - 1/scaled); -inf when scaled_fraction == 1."
    exp_nmut = exp_n_mutated(n_unique_kmers, ksize, mutation_rate)
    try:
        return (n_unique_kmers - exp_nmut) * log(1.0 - scaled_fraction)
    except ValueError:
        return float("-inf")


def get_exp_probability_nothing_common(
    mutation_rate, ksize, scaled, *, n_unique_kmers=None, sequence_len_bp=None
):
    "Expected probability two sketches share nothing (false-negative check)."
    n_unique_kmers = handle_seqlen_nkmers(
        ksize, sequence_len_bp=sequence_len_bp, n_unique_kmers=n_unique_kmers
    )
    if mutation_rate == 1.0:
        return 1.0
    if mutation_rate == 0.0:
        return 0.0
    return exp(
        get_expected_log_probability(
            n_unique_kmers, ksize, mutation_rate, 1.0 / float(scaled)
        )
    )


def containment_to_distance(
    containment,
    ksize,
    scaled,
    *,
    n_unique_kmers=None,
    sequence_len_bp=None,
    confidence=0.95,
    estimate_ci=False,
    prob_threshold=1e-3,
):
    "Containment → distance point estimate, optionally with CI via brentq."
    sol1 = sol2 = None
    n_unique_kmers = handle_seqlen_nkmers(
        ksize, sequence_len_bp=sequence_len_bp, n_unique_kmers=n_unique_kmers
    )
    if containment == 0:
        point_estimate = sol1 = sol2 = 1.0
    elif containment == 1:
        point_estimate = sol1 = sol2 = 0.0
    else:
        point_estimate = 1.0 - containment ** (1.0 / ksize)
        if estimate_ci:
            try:
                z_alpha = probit(1 - (1 - confidence) / 2)
                f_scaled = 1.0 / scaled
                bias_factor = 1 - (1 - f_scaled) ** n_unique_kmers
                term_1 = (1.0 - f_scaled) / (
                    f_scaled * n_unique_kmers**3 * bias_factor**2
                )

                def var_direct(pest):
                    t2 = n_unique_kmers * exp_n_mutated(
                        n_unique_kmers, ksize, pest
                    ) - exp_n_mutated_squared(n_unique_kmers, ksize, pest)
                    t3 = var_n_mutated(n_unique_kmers, ksize, pest) / n_unique_kmers**2
                    return term_1 * t2 + t3

                def f1(pest):
                    return (
                        (1 - pest) ** ksize
                        + z_alpha * sqrt(var_direct(pest))
                        - containment
                    )

                def f2(pest):
                    return (
                        (1 - pest) ** ksize
                        - z_alpha * sqrt(var_direct(pest))
                        - containment
                    )

                sol1 = brentq(f1, 0.0000001, 0.9999999)
                sol2 = brentq(f2, 0.0000001, 0.9999999)
            except ValueError as exc:
                notify(
                    "WARNING: Cannot estimate ANI confidence intervals from containment. Do your sketches contain enough hashes?"
                )
                notify(str(exc))
                sol1 = sol2 = None

    prob_nothing_in_common = get_exp_probability_nothing_common(
        point_estimate, ksize, scaled, n_unique_kmers=n_unique_kmers
    )
    return ciANIResult(
        point_estimate,
        prob_nothing_in_common,
        dist_low=sol2,
        dist_high=sol1,
        p_threshold=prob_threshold,
    )


def jaccard_to_distance(
    jaccard,
    ksize,
    scaled,
    *,
    n_unique_kmers=None,
    sequence_len_bp=None,
    prob_threshold=1e-3,
    err_threshold=1e-4,
):
    "Jaccard → distance point estimate with approximation-error lower bound."
    n_unique_kmers = handle_seqlen_nkmers(
        ksize, sequence_len_bp=sequence_len_bp, n_unique_kmers=n_unique_kmers
    )
    if jaccard == 0:
        point_estimate = 1.0
        error_lower_bound = 0.0
    elif jaccard == 1:
        point_estimate = 0.0
        error_lower_bound = 0.0
    else:
        point_estimate = 1.0 - (2.0 * jaccard / float(1 + jaccard)) ** (
            1.0 / float(ksize)
        )
        exp_n_mut = exp_n_mutated(n_unique_kmers, ksize, point_estimate)
        var_n_mut = var_n_mutated(n_unique_kmers, ksize, point_estimate)
        error_lower_bound = (
            1.0 * n_unique_kmers * var_n_mut / (n_unique_kmers + exp_n_mut) ** 3
        )
    prob_nothing_in_common = get_exp_probability_nothing_common(
        point_estimate, ksize, scaled, n_unique_kmers=n_unique_kmers
    )
    return jaccardANIResult(
        point_estimate,
        prob_nothing_in_common,
        jaccard_error=error_lower_bound,
        p_threshold=prob_threshold,
        je_threshold=err_threshold,
    )
