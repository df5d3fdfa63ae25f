"""SAO parameter estimation (TEncSampleAdaptiveOffset) - in progress.

Behavioral reference: TEncSampleAdaptiveOffset.cpp (SAOProcess,
rdoSaoUnitAll) with SAO_SINGLE_MERGE/SAO_TYPE_SHARING/SAO_ENCODING_CHOICE.
"""

from __future__ import annotations


class SaoEncoder:
    def __init__(self, frame, sh, sps, cfg, lambda_luma, lambda_chroma):
        raise NotImplementedError(
            "SAO encoder not implemented yet; encode with --SAO=0")
