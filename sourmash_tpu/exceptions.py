"""Exception hierarchy (mirrors reference `src/sourmash/exceptions.py`,
which is generated from Rust error codes in `src/core/src/errors.rs`)."""


class SourmashError(Exception):
    def __init__(self, msg):
        super().__init__(msg)
        self.message = msg


class IndexNotSupported(SourmashError):
    pass


class MismatchKSizes(SourmashError):
    pass


class MismatchDNAProt(SourmashError):
    pass


class MismatchScaled(SourmashError):
    pass


class MismatchSeed(SourmashError):
    pass


class MismatchSignatureType(SourmashError):
    pass


class NonEmptyMinHash(SourmashError):
    pass


class MismatchNum(SourmashError):
    pass


class InvalidDNA(SourmashError):
    pass


class InvalidProt(SourmashError):
    pass


class CannotUpsampleScaled(SourmashError):
    pass


class CannotDownsampleNum(SourmashError):
    pass


class NeedsAbundanceTracking(SourmashError):
    pass
