"""Minimal robots.txt model + the synthetic per-host robots fixture.

The reference bundles a robots library via colly but never configures it —
it crawls impolitely (SURVEY.md §2.3 T6).  The north rule makes per-host
robots caching part of the politeness actor state, so this module provides:

- :class:`RobotsRules` — parse a robots.txt body (User-agent groups,
  Allow/Disallow with the widely-implemented ``*`` and ``$`` extensions,
  Crawl-delay), longest-pattern-wins matching, Allow beats Disallow on tie;
- :func:`robots_body` — the deterministic fixture (FIXTURES.md §4): every
  host gets a crawl-delay from {0, 50, 200, 1000} ms; ~5% of paths are
  disallowed via five ``Disallow: /*dd$`` suffix rules; 2 hosts disallow
  everything.

Parsed once per host per epoch and cached inside the politeness shard actor.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from .. import config


class RobotsRules:
    def __init__(self, body: str, agent: str = "*"):
        self.crawl_delay_s: float | None = None
        self._rules: list[tuple[bool, str, re.Pattern]] = []  # (is_allow, raw, regex)
        self._parse(body, agent)
        # fast path: no Allow rules -> one combined alternation regex; a
        # single C-level match replaces the per-rule Python loop (hot path:
        # every scheduled URL passes through allowed())
        if any(r[0] for r in self._rules) or not self._rules:
            self._combined = None
        else:
            self._combined = re.compile(
                "^(?:" + "|".join(rx.pattern[1:] for _, _, rx in self._rules) + ")"
            )

    @staticmethod
    def _compile(pattern: str) -> re.Pattern:
        out = []
        for ch in pattern:
            if ch == "*":
                out.append(".*")
            elif ch == "$":
                out.append("$")
            else:
                out.append(re.escape(ch))
        return re.compile("^" + "".join(out))

    def _parse(self, body: str, agent: str) -> None:
        groups: dict[str, list[tuple[str, str]]] = {}
        current: list[str] = []
        last_was_agent = False
        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                if not last_was_agent:
                    current = []
                current.append(val.lower())
                for a in current:
                    groups.setdefault(a, [])
                last_was_agent = True
            else:
                last_was_agent = False
                for a in current or ["*"]:
                    groups.setdefault(a, []).append((key, val))
        rules = groups.get(agent.lower(), groups.get("*", []))
        for key, val in rules:
            if key in ("allow", "disallow"):
                if val == "" and key == "disallow":
                    continue  # empty Disallow = allow all
                self._rules.append((key == "allow", val, self._compile(val)))
            elif key == "crawl-delay":
                try:
                    self.crawl_delay_s = float(val)
                except ValueError:
                    pass

    def allowed(self, path: str) -> bool:
        """Longest-matching-pattern wins; Allow beats Disallow on equal
        length (Google's published matching semantics)."""
        if self._combined is not None:  # disallow-only rule set
            return self._combined.match(path) is None
        best_len, best_allow = -1, True
        for is_allow, raw, rx in self._rules:
            if rx.match(path):
                L = len(raw)
                if L > best_len or (L == best_len and is_allow):
                    best_len, best_allow = L, is_allow
        return best_allow

    def allowed_many(self, paths: list[str]) -> np.ndarray:
        if self._combined is not None:
            m = self._combined.match
            return np.fromiter((m(p) is None for p in paths), dtype=bool, count=len(paths))
        if not self._rules:
            return np.ones(len(paths), dtype=bool)
        return np.fromiter((self.allowed(p) for p in paths), dtype=bool, count=len(paths))


# ------------------------------------------------------------------ fixture

def _host_digest(host: str, seed: int) -> bytes:
    return hashlib.sha1(f"robots:{seed}:{host}".encode()).digest()


def crawl_delay_ms(host: str, seed: int = config.CORPUS_SEED) -> int:
    d = _host_digest(host, seed)
    return config.CRAWL_DELAY_CHOICES_MS[d[0] % len(config.CRAWL_DELAY_CHOICES_MS)]


def host_fully_blocked(host: str, seed: int = config.CORPUS_SEED,
                       n_hosts: int = config.N_HOSTS) -> bool:
    """Exactly 2 deterministic hosts disallow everything (FIXTURES.md §4).
    Chosen away from host-0 (the hottest) so blocking them doesn't empty the
    crawl."""
    try:
        idx = int(host.split("-")[1].split(".")[0])
    except (IndexError, ValueError):
        return False
    if n_hosts > 23:
        blocked = {7, 23}
    elif n_hosts >= 4:
        # distinct and never host-0 for any n >= 4
        blocked = {n_hosts - 1, n_hosts // 2}
    else:
        # tiny host spaces: blocking 2 of <4 hosts (or host-0 itself) would
        # gut the crawl — no fully-blocked hosts below 4
        blocked = set()
    return idx in blocked


def disallowed_suffixes(host: str, seed: int = config.CORPUS_SEED) -> list[str]:
    """Five distinct 2-digit suffixes -> ~5% of paths disallowed per host."""
    d = _host_digest(host, seed)
    out: list[str] = []
    i = 1
    while len(out) < 5 and i < 18:
        s = f"{d[i] % 100:02d}"
        if s not in out:
            out.append(s)
        i += 1
    return out


def robots_body(host: str, seed: int = config.CORPUS_SEED,
                n_hosts: int = config.N_HOSTS) -> str:
    delay = crawl_delay_ms(host, seed) / 1000.0
    lines = ["User-agent: *", f"Crawl-delay: {delay}"]
    if host_fully_blocked(host, seed, n_hosts):
        lines.append("Disallow: /")
    else:
        lines += [f"Disallow: /*{s}$" for s in disallowed_suffixes(host, seed)]
    return "\n".join(lines) + "\n"
