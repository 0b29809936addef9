"""The ONE link-commit CAS protocol behind every multi-writer parquet
artifact in the engine.

Two subsystems need compare-and-swap over shared-filesystem parquet:
the model catalog's versioned tables (catalog/catalog.py — two drivers
sharing a warehouse) and the persisted index manifests
(operators/_manifest.py — concurrent appenders folding row counts).
Both committed versions with an atomic create-if-absent hard link; the
round-9 verdict flagged the duplication of that subtle concurrency
core as a divergence risk. This module is the single implementation;
both keep their public APIs and their own naming/layout, read paths,
retention depth, and conflict exception types.

Protocol per commit (``commit_frame``):

1. **Stale-base pre-check** — the presented base must EQUAL the
   committed head. Below it, retention may have freed the target slot
   (linking would be silently invisible to max-version readers); above
   it, the chain was rebuilt/cleared and linking would shadow fresh
   state with stale fields.
2. **Atomic create-if-absent** — the payload is written to a temp file
   and ``os.link``-ed into the version slot; EEXIST = another writer
   won the slot = loud conflict, never a clobber.
3. **Recycle-race post-check** — the residual window between (1) and
   (2): if >= ``keep`` commits landed in it, retention freed the slot
   and the link re-minted an invisible version. Detected by re-reading
   the head; disambiguated from a legitimate racer that built ON this
   commit via the mtime of ``v(base+2)`` (a builder-on read this
   commit's token, so it linked strictly AFTER it; a recycled chain's
   ``v(base+2)`` long predates it or is itself pruned). On recycle the
   orphan token is unlinked — the head never pointed at it, so nobody
   observed it — and the commit conflicts loudly.
4. **Retention prune** — versions older than the newest ``keep`` are
   unlinked; readers racing the unlink re-resolve the head (their
   documented retry).

On an object store without hard links, map step 2 to a conditional put
(S3 If-None-Match / GCS x-goog-if-generation-match); steps 1/3/4 are
unchanged.
"""

from __future__ import annotations

import os
import tempfile


class CasVersions:
    """Naming + listing for one CAS-versioned object: token files
    ``{directory}/{prefix}{NNNNNNNN}.parquet``."""

    def __init__(self, directory: str, prefix: str, keep: int):
        self.directory = directory
        self.prefix = prefix
        self.keep = keep

    def token_path(self, version: int) -> str:
        return os.path.join(
            self.directory, f"{self.prefix}{version:08d}.parquet"
        )

    def current_version(self) -> int:
        """Highest committed version (0 = none; legacy layout only)."""
        best = 0
        try:
            names = os.listdir(self.directory)
        except FileNotFoundError:
            return 0
        for name in names:
            if name.startswith(self.prefix) and name.endswith(".parquet"):
                try:
                    best = max(
                        best, int(name[len(self.prefix) : -len(".parquet")])
                    )
                except ValueError:
                    continue
        return best

    def prune(self) -> None:
        """Drop token versions older than the newest ``keep``. A stray
        prefix-matching file with a non-integer version (a manual
        backup copy, say) is skipped per-name, the same as
        current_version — an except around the whole listing would
        silently disable retention forever (review catch)."""
        try:
            names = os.listdir(self.directory)
        except FileNotFoundError:
            return
        versions = []
        for n in names:
            if n.startswith(self.prefix) and n.endswith(".parquet"):
                try:
                    versions.append(int(n[len(self.prefix) : -len(".parquet")]))
                except ValueError:
                    continue
        for v in sorted(versions)[: -self.keep]:
            try:
                os.unlink(self.token_path(v))
            except FileNotFoundError:
                pass


def commit_frame(
    versions: CasVersions,
    df,
    base_version: int,
    conflict: type[Exception],
    what: str,
) -> int:
    """Commit the pandas frame ``df`` as version ``base_version + 1``
    under the full protocol above. Raises ``conflict`` (the caller's
    exception type) on any lost race; returns the committed version.
    The caller is responsible for any layout-specific follow-up
    (legacy-file cleanup, head mirrors) AFTER this returns."""
    cur = versions.current_version()
    if base_version != cur:
        raise conflict(
            f"{what} is at version {cur}, base {base_version} is stale — "
            f"another writer committed first; re-read and retry"
        )
    os.makedirs(versions.directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=versions.directory, suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        df.to_parquet(tmp, index=False)
        target = versions.token_path(base_version + 1)
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise conflict(
                f"{what} version {base_version + 1} was committed by "
                f"another writer; re-read and retry"
            ) from None
    finally:
        os.unlink(tmp)
    if versions.current_version() > base_version + 1:
        try:
            next_mtime = os.stat(
                versions.token_path(base_version + 2)
            ).st_mtime_ns
            recycled = next_mtime < os.stat(target).st_mtime_ns
        except FileNotFoundError:
            # v(base+2) is gone. Retention prunes OLDEST first, so a
            # chain that genuinely built ON this commit and then pruned
            # v(base+2) must have pruned v(base+1) — our token — first.
            # Our token still present => v(base+2) was never created in
            # this chain epoch: the slot was recycled from an old chain.
            # Our token gone => we were folded in and pruned: a WON
            # commit, not a recycle (treating it as recycled would make
            # cas_update retry and double-apply the fold — review
            # catch).
            recycled = os.path.exists(target)
        if recycled:
            try:
                os.unlink(target)  # head never pointed here; safe
            except FileNotFoundError:
                pass
            raise conflict(
                f"{what} slot {base_version + 1} was recycled by "
                f"retention while this commit was in flight (another "
                f"writer raced past); re-read and retry"
            )
    versions.prune()
    return base_version + 1
