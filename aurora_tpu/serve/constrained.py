"""Constrained decoding: choice tries with per-step token masks.

Capability parity with sglang's constrained decode
(src/sglang/python/sglang/srt/constrained/ — outlines regex→FSM cache +
jump-forward). The reference's FSM machinery leans on the `outlines`
library (absent here); this module covers the workhorse case — constraining
output to one of a finite set of strings (yes/no, multiple choice, labels)
— with a token trie walked host-side while the device consumes a [V] bool
mask per step. Forced stretches (single allowed continuation) are the
jump-forward analog: the engine still writes their KV through the normal
decode step, so correctness never depends on re-tokenization.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Set, Tuple

import numpy as np


class ChoiceConstraint:
    """Constrain generation to one of `choices` (token-id sequences)."""

    def __init__(self, choices_token_ids: Sequence[Sequence[int]]):
        assert choices_token_ids, "need at least one choice"
        self.choices = [list(c) for c in choices_token_ids]
        self.pos = 0
        self.alive: Set[int] = set(range(len(self.choices)))

    @classmethod
    def from_strings(cls, tokenizer, choices: Sequence[str]):
        return cls([tokenizer.encode(c, add_special_tokens=False)
                    for c in choices])

    def allowed_tokens(self) -> List[int]:
        out = []
        for i in self.alive:
            c = self.choices[i]
            if self.pos < len(c):
                out.append(c[self.pos])
        return sorted(set(out))

    def advance(self, token: int) -> None:
        self.alive = {i for i in self.alive
                      if self.pos < len(self.choices[i])
                      and self.choices[i][self.pos] == token}
        self.pos += 1

    @property
    def finished(self) -> bool:
        """Done when some alive choice is fully consumed and no longer one
        continues past it."""
        if not self.alive:
            return True
        return all(len(self.choices[i]) <= self.pos for i in self.alive)

    def mask(self, vocab_size: int) -> np.ndarray:
        m = np.zeros((vocab_size,), bool)
        allowed = self.allowed_tokens()
        if allowed:
            m[allowed] = True
        else:
            m[:] = True  # exhausted → unconstrained (engine finishes us)
        return m
