#!/usr/bin/env python3
"""Plan-drift gate: diff two plan-fingerprint files and emit the list of
queries whose executed plan changed — exactly the set that needs an sf1
oracle re-verify before "registry-wide sf1 holds by composition" can be
claimed for the round.

Workflow (the round-N sf1 protocol):
    sbt "runMain graft.Explain /root/testdata/sf0.001 /tmp/plan_fps.tsv --fingerprint"
    python3 scripts/check_plan_drift.py PLAN_FPS.tsv /tmp/plan_fps.tsv
      -> prints NEW/CHANGED/REMOVED queries + a comma list for Verify
    sbt "runMain graft.Verify /tmp/sf1 /tmp/verify_sf1 <comma-list>"
    python3 scripts/check_oracle_timeout.py /tmp/sf1 /tmp/verify_sf1 900
      -> on top of the console report it writes /tmp/verify_sf1/.oracle_green,
         the machine-readable list of queries that PASSED this compare
    python3 scripts/check_plan_drift.py PLAN_FPS.tsv /tmp/plan_fps.tsv \
        --update --verified /tmp/verify_sf1/.oracle_green
      -> promote the fresh file to baseline. Plain --update promotes
         only when NO drift remains; with drift present it requires
         --verified green-list file(s) (repeatable) covering every
         NEW/CHANGED query — the promote is gated on the checker's own
         artifact, not on a caller's bare assertion, so a premature
         promote can't launder unverified plan changes. REMOVED queries
         additionally need --allow-removed (deregistration is always an
         explicit, narrated act).

Exit status: 0 if no drift, 1 if any query is new/changed/removed (so a
round script can gate on it), 2 on usage errors.
"""
import sys


def load(path):
    fps = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            name, _, fp = line.partition("\t")
            if not fp:
                sys.exit(f"malformed fingerprint line in {path}: {line!r}")
            fps[name] = fp
    if not fps:
        sys.exit(f"{path}: zero fingerprint entries — wrong file?")
    return fps


def main():
    argv = sys.argv[1:]
    args, verified_paths = [], []
    update = allow_removed = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--update":
            update = True
        elif a == "--allow-removed":
            allow_removed = True
        elif a == "--verified":
            i += 1
            if i >= len(argv):
                sys.exit("--verified needs a green-list file argument")
            verified_paths.append(argv[i])
        elif a.startswith("--verified="):
            verified_paths.append(a.split("=", 1)[1])
        elif a == "--force":
            sys.exit("--force is retired: pass --verified <.oracle_green file> "
                     "from check_oracle_timeout.py instead (see docstring)")
        elif a.startswith("--"):
            sys.exit(f"unknown flag {a}")
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    base_path, cur_path = args
    verified = set()
    for vp in verified_paths:
        with open(vp) as f:
            verified.update(line.strip() for line in f if line.strip())
    base, cur = load(base_path), load(cur_path)

    failed = sorted(n for n, fp in cur.items() if fp.startswith("FAILED:"))
    new = sorted(set(cur) - set(base))
    removed = sorted(set(base) - set(cur))
    changed = sorted(n for n in set(base) & set(cur) if base[n] != cur[n])

    for label, names in (("FAILED", failed), ("NEW", new),
                         ("REMOVED", removed), ("CHANGED", changed)):
        for n in names:
            print(f"{label} {n}")
    need = sorted(set(new) | set(changed))
    if failed:
        print(f"== {len(failed)} queries FAILED to plan — fix before gating ==")
        sys.exit(1)
    if need:
        print(f"== {len(need)} queries need an sf1 re-verify ==")
        print(",".join(need))
    else:
        print("== no plan drift: registry-wide sf1 holds by composition ==")
    if update:
        # Promoting a baseline that still shows drift would launder
        # unverified plan changes: with drift present, --update demands
        # the sf1 checker's own green-list artifact covering every
        # NEW/CHANGED query — not a caller's bare say-so.
        unverified = sorted(set(need) - verified)
        if unverified:
            print("[update] REFUSED: drifted queries lack an sf1 oracle "
                  "green-list entry (--verified <out_dir>/.oracle_green "
                  f"from check_oracle_timeout.py): {','.join(unverified)}")
            sys.exit(1)
        if removed and not allow_removed:
            print("[update] REFUSED: REMOVED queries present "
                  f"({','.join(removed)}) — deregistration must be "
                  "acknowledged explicitly with --allow-removed")
            sys.exit(1)
        with open(base_path, "w") as f:
            for n in sorted(cur):
                f.write(f"{n}\t{cur[n]}\n")
        print(f"[update] baseline {base_path} <- {cur_path}")
    sys.exit(1 if (need or removed) else 0)


if __name__ == "__main__":
    main()
