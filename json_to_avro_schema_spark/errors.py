"""Typed compile-time errors for the spec pipeline.

Mirrors the reference's three-error-channel design
(/root/reference/src/main/scala/Errors.scala:3-10 — ParserError,
ResolutionError, TranspileError carried in Either): the engine raises the
equivalent exceptions *before any Spark job is scheduled* (fail-fast on the
driver).
"""

from __future__ import annotations


class SpecError(Exception):
    """Base class for all spec-compilation failures."""


class SpecParseError(SpecError):
    """Spec document is malformed (reference: ParserError)."""


class SpecResolutionError(SpecError):
    """$id normalization / symbol resolution failed (reference: ResolutionError)."""


class SpecCompileError(SpecError):
    """Spec is well-formed but cannot be lowered to a plan (reference: TranspileError)."""


class SchemaMismatchError(SpecError):
    """The DataFrame under validation does not physically match the spec's
    expected StructType (the 'type' keyword check, failed at table level)."""

    def __init__(self, problems):
        self.problems = list(problems)
        super().__init__(
            "table schema does not conform to spec: " + "; ".join(self.problems)
        )


class ValidationFailedError(SpecError):
    """Raised by runner.fail_on_violations when a validated table carries
    more enforce-severity violations than the caller allows — the
    fail-the-pipeline expectation level (Delta Live Tables' expect_or_fail,
    Deequ's error level), on top of the always-on report (warn) and
    violations-frame (drop) levels."""

    def __init__(self, n_violations: int, limit: int, sample):
        self.n_violations = n_violations
        self.limit = limit
        self.sample = sample
        super().__init__(
            f"validation failed: {n_violations} violation rows "
            f"(allowed: {limit}); sample: {sample}"
        )
