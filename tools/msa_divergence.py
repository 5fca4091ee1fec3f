"""Star-MSA vs progressive-oracle divergence harness (VERDICT r1 item #1).

The production indel path builds its tensors with a star MSA around the
reference window (align/msa.py); the reference defines them by MUSCLE 3.8
at -maxiters 1 (/root/reference/nanocaller_src/generate_indel_pileups.py:29-31).
align/prog_msa.py reimplements that algorithm (k-mer distance -> UPGMA ->
progressive profile-profile alignment) as a slow oracle. This harness
measures, over thousands of simulated candidate windows, how much the two
MSAs diverge at each level that can change a final call:

  1. consensus string   — the ALT allele source (msa():53-67)
  2. tensor             — the CNN input (max-abs / L1 over (5,128,2))
  3. allele prediction  — allele_prediction(cns, ref) REF/ALT equality
  4. model probability  — IndelModel probs on star vs oracle tensors
                          (argmax class + max prob delta), optional

Window mix stresses where ONT actually fails: homopolymer-situated
indels with length-dependent homopolymer indel noise (the reference's
published weak spot, BASELINE.md indel tables), plus uniform-noise
ins/del/none windows and het mixtures.

Usage:
    python tools/msa_divergence.py --trials 2000 --depth 25 --seed 0
    python tools/msa_divergence.py --trials 400 --sweep   # gap-param grid
    python tools/msa_divergence.py --trials 400 --model ONT-HG002

Prints a human-readable table and one final JSON line for records.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from nanocaller_tpu.align.msa import star_msa  # noqa: E402
from nanocaller_tpu.align.prog_msa import prog_msa  # noqa: E402
from nanocaller_tpu.pileup.indel_features import allele_prediction  # noqa: E402

BASES = "ACGT"


def random_window(rng, length, hp_rich=False):
    """Reference window; hp_rich plants 3 long homopolymer runs (5-12 bp)
    so indels land where ONT chemistry actually slips."""
    seq = [BASES[i] for i in rng.integers(0, 4, size=length)]
    if hp_rich:
        for _ in range(3):
            run = int(rng.integers(5, 13))
            start = int(rng.integers(10, length - run - 10))
            base = BASES[int(rng.integers(0, 4))]
            seq[start : start + run] = [base] * run
    return "".join(seq)


def plant_variant(rng, ref, kind, in_hp):
    """Apply one variant to ref; returns (haplotype, description)."""
    if kind == "none":
        return ref, "none"
    # position: inside a homopolymer run if requested and one exists
    pos = None
    if in_hp:
        runs = []
        i = 0
        while i < len(ref):
            j = i
            while j < len(ref) and ref[j] == ref[i]:
                j += 1
            if j - i >= 5 and 15 < i < len(ref) - 25:
                runs.append((i, j))
            i = j
        if runs:
            lo, hi = runs[int(rng.integers(0, len(runs)))]
            pos = int(rng.integers(lo + 1, hi))
    if pos is None:
        pos = int(rng.integers(20, len(ref) - 30))
    size = int(rng.integers(1, 11))
    if kind == "ins":
        if in_hp:
            piece = ref[pos] * size  # homopolymer expansion
        else:
            piece = "".join(BASES[i] for i in rng.integers(0, 4, size=size))
        return ref[:pos] + piece + ref[pos:], f"ins{size}@{pos}"
    # deletion (homopolymer contraction when in_hp)
    return ref[:pos] + ref[pos + size :], f"del{size}@{pos}"


def noisy_read(rng, hap, sub_rate, indel_rate, hp_slip):
    """ONT-like copy: uniform subs/indels plus homopolymer slips whose
    probability grows with run length (p = hp_slip*(run_len-2), cap 0.5);
    a slip inserts or deletes one base of the run."""
    out = []
    i = 0
    n = len(hap)
    while i < n:
        j = i
        while j < n and hap[j] == hap[i]:
            j += 1
        run = hap[i:j]
        # per-base uniform noise inside the run
        for ch in run:
            r = rng.random()
            if r < indel_rate / 2:
                continue
            if r < indel_rate:
                out.append(BASES[int(rng.integers(0, 4))])
            if rng.random() < sub_rate:
                out.append(BASES[int(rng.integers(0, 4))])
            else:
                out.append(ch)
        if j - i >= 3 and hp_slip > 0:
            p = min(0.5, hp_slip * (j - i - 2))
            if rng.random() < p:
                if rng.random() < 0.5:
                    out.append(hap[i])  # expansion slip
                else:
                    for k in range(len(out) - 1, -1, -1):
                        if out[k] == hap[i]:
                            del out[k]  # contraction slip
                            break
        i = j
    return "".join(out)


def gen_window(rng, depth, length, sub_rate, indel_rate, hp_slip):
    """One candidate window; returns dict with ref, truth hap(s), reads,
    and the truth haplotype index per read (for the final-call mode's
    phased per-hap MSAs)."""
    cat = rng.choice(["none", "ins", "del", "hp_ins", "hp_del", "het_ins",
                      "het_del"])
    hp_rich = cat.startswith("hp")
    ref = random_window(rng, length, hp_rich=hp_rich or rng.random() < 0.3)
    kind = cat.split("_")[-1] if cat != "none" else "none"
    hap1, desc = plant_variant(rng, ref, kind, in_hp=hp_rich)
    hap2 = ref if cat.startswith("het") else hap1
    reads = {}
    read_hap = {}
    for r in range(depth):
        on_h1 = r % 2 == 0
        hap = hap1 if (on_h1 or hap2 == hap1) else hap2
        s = noisy_read(rng, hap, sub_rate, indel_rate, hp_slip)
        if s:
            name = f"r{r:03d}"
            reads[name] = s
            # phasing splits reads across haps even at hom sites
            read_hap[name] = 1 if on_h1 else 0
    return {"cat": cat, "ref": ref, "hap": hap1, "reads": reads,
            "read_hap": read_hap, "desc": desc}


def run_trials(trials, depth, length, sub_rate, indel_rate, hp_slip, seed,
               gap_open=1, gap_extend=1, model=None, progress=True):
    rng = np.random.default_rng(seed)
    stats = {
        "n": 0, "cns_equal": 0, "star_cns_true": 0, "prog_cns_true": 0,
        "allele_equal": 0, "tensor_linf": [], "per_cat": {},
    }
    star_tensors, prog_tensors = [], []
    t0 = time.time()
    for t in range(trials):
        w = gen_window(rng, depth, length, sub_rate, indel_rate, hp_slip)
        fs, _, xs, cns_s, refd_s = star_msa(w["reads"], w["ref"], 1000 + t,
                                            4, 160)
        fp, _, xp, cns_p, refd_p = prog_msa(w["reads"], w["ref"], 1000 + t,
                                            4, 160, gap_open=gap_open,
                                            gap_extend=gap_extend)
        if not (fs and fp):
            continue
        assert refd_s == w["ref"] and refd_p == w["ref"]
        al_s = allele_prediction(cns_s, refd_s, 40)
        al_p = allele_prediction(cns_p, refd_p, 40)
        cat = stats["per_cat"].setdefault(
            w["cat"], {"n": 0, "cns_equal": 0, "allele_equal": 0,
                       "star_cns_true": 0, "prog_cns_true": 0})
        stats["n"] += 1
        cat["n"] += 1
        for d, k, v in ((stats, "cns_equal", cns_s == cns_p),
                        (stats, "star_cns_true", cns_s == w["hap"]),
                        (stats, "prog_cns_true", cns_p == w["hap"]),
                        (stats, "allele_equal", al_s == al_p),
                        (cat, "cns_equal", cns_s == cns_p),
                        (cat, "allele_equal", al_s == al_p),
                        (cat, "star_cns_true", cns_s == w["hap"]),
                        (cat, "prog_cns_true", cns_p == w["hap"])):
            d[k] += int(v)
        stats["tensor_linf"].append(float(np.abs(xs - xp).max()))
        if model is not None:
            star_tensors.append(xs)
            prog_tensors.append(xp)
        if progress and (t + 1) % 200 == 0:
            print(f"  {t+1}/{trials} windows ({time.time()-t0:.0f}s)",
                  file=sys.stderr)
    if model is not None and star_tensors:
        stats["model"] = model_divergence(model, star_tensors, prog_tensors)
    return stats


def _decode_one(probs, a0, a1, at):
    """Single-record mirror of decode_diploid_indels (indelCaller.py:91-152):
    returns a canonical call tuple (GT, REF, ALTs) or None (no call).
    Overlap suppression / PS / QUAL omitted — call identity only."""
    if probs[0] > 0.95:
        return None
    if int(np.argmax(probs)) == 1 and at[0]:
        return ("1/1", at[0], (at[1],))
    if a0[0] and a1[0]:
        if a0[0] == a1[0] and a0[1] == a1[1]:
            return ("1/1", a0[0], (a0[1],))
        (ref1, alt1), (ref2, alt2) = a0, a1
        l = min(len(ref1), len(ref2))
        if len(ref1) > len(ref2):
            ref, alt2 = ref1, alt2 + ref1[l:]
        else:
            ref, alt1 = ref2, alt1 + ref2[l:]
        return ("1|2", ref, (alt1, alt2))
    if a0[0]:
        return ("0|1", a0[0], (a0[1],))
    if a1[0]:
        return ("1|0", a1[0], (a1[1],))
    return None


def _truth_call(w):
    """Expected call tuple for a window from its planted variant."""
    if w["cat"] == "none":
        return None
    ref_al, alt_al = allele_prediction(w["hap"], w["ref"], 40)
    if not ref_al:
        return None
    gt = "het" if w["cat"].startswith("het") else "1/1"
    return (gt, ref_al, (alt_al,))


def _calls_equal(ca, cb):
    """GT-class + allele-set equality; 0|1 vs 1|0 is the arbitrary hap
    orientation, and truth 'het' matches either."""
    if ca is None or cb is None:
        return ca is cb
    ga, gb = ca[0], cb[0]
    het = {"0|1", "1|0", "het"}
    gt_eq = ga == gb or (ga in het and gb in het)
    return gt_eq and ca[1] == cb[1] and set(ca[2]) == set(cb[2])


def run_final_call_trials(trials, depth, length, sub_rate, indel_rate,
                          hp_slip, seed, model_name, gap_open=1,
                          gap_extend=1, progress=True):
    """The production contract, both ways: per-window hap0/hap1/all MSAs
    (truth phasing), released indel CNN on the stacked (15,128,2) tensor,
    decode-tree call. Measures star-vs-oracle FINAL CALL concordance and
    each side's accuracy vs the planted truth — the level at which MSA
    divergence can actually change a VCF record
    (generate_indel_pileups.py:341-361 + indelCaller.py:83-152)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nanocaller_tpu.models import IndelModel, load_model

    params, _ = load_model("indel", model_name)
    fwd = jax.jit(IndelModel().apply)

    rng = np.random.default_rng(seed)
    rows = []  # (cat, star tensors+alleles, prog tensors+alleles, truth)
    t0 = time.time()
    for t in range(trials):
        w = gen_window(rng, depth, length, sub_rate, indel_rate, hp_slip)
        groups = {
            0: {n: s for n, s in w["reads"].items() if w["read_hap"][n] == 0},
            1: {n: s for n, s in w["reads"].items() if w["read_hap"][n] == 1},
        }
        per_algo = {}
        for algo, fn in (("star", star_msa), ("prog", prog_msa)):
            tensors, alleles = [], []
            ok = True
            kw = ({} if algo == "star" else
                  {"gap_open": gap_open, "gap_extend": gap_extend})
            for part, mincov in ((groups[0], 2), (groups[1], 2),
                                 (w["reads"], 4)):
                fl, _, x, cns, refd = fn(part, w["ref"], 1000 + t, mincov,
                                         160, **kw)
                if not fl:
                    ok = False
                    break
                tensors.append(x)
                alleles.append(allele_prediction(cns, refd, 40))
            if ok:
                per_algo[algo] = (np.concatenate(tensors, axis=0), alleles)
        if len(per_algo) == 2:
            rows.append((w["cat"], per_algo["star"], per_algo["prog"],
                         _truth_call(w)))
        if progress and (t + 1) % 200 == 0:
            print(f"  {t+1}/{trials} windows ({time.time()-t0:.0f}s)",
                  file=sys.stderr)
    if not rows:
        return {"n": 0}
    xs = np.stack([r[1][0] for r in rows]).astype(np.float32)
    xp = np.stack([r[2][0] for r in rows]).astype(np.float32)
    ps = np.asarray(fwd(params, xs))
    pp = np.asarray(fwd(params, xp))
    stats = {"n": len(rows), "call_equal": 0, "star_true": 0,
             "prog_true": 0, "argmax_equal": 0, "per_cat": {}}
    for i, (cat, (_, al_s), (_, al_p), truth) in enumerate(rows):
        call_s = _decode_one(ps[i], *al_s)
        call_p = _decode_one(pp[i], *al_p)
        c = stats["per_cat"].setdefault(
            cat, {"n": 0, "call_equal": 0, "star_true": 0, "prog_true": 0})
        c["n"] += 1
        for d in (stats, c):
            d["call_equal"] += int(_calls_equal(call_s, call_p))
            d["star_true"] += int(_calls_equal(call_s, truth))
            d["prog_true"] += int(_calls_equal(call_p, truth))
        stats["argmax_equal"] += int(ps[i].argmax() == pp[i].argmax())
    return stats


def report_final(stats, label=""):
    n = max(stats.get("n", 0), 1)
    print(f"\n== final-call divergence {label} (n={stats.get('n', 0)}) ==")
    print(f"call star==prog      : {stats['call_equal']/n:.4f}")
    print(f"call star==truth     : {stats['star_true']/n:.4f}")
    print(f"call prog==truth     : {stats['prog_true']/n:.4f}")
    print(f"CNN argmax equal     : {stats['argmax_equal']/n:.4f}")
    print(f"{'category':>8} {'n':>5} {'call=':>6} {'star_true':>9} "
          f"{'prog_true':>9}")
    for cat, c in sorted(stats["per_cat"].items()):
        cn = max(c["n"], 1)
        print(f"{cat:>8} {c['n']:>5} {c['call_equal']/cn:>6.3f} "
              f"{c['star_true']/cn:>9.3f} {c['prog_true']/cn:>9.3f}")


def model_divergence(model_name, star_tensors, prog_tensors):
    """Run the indel CNN on both tensor sets (x0=x1=x2 stacking, the
    diploid input layout of indelCaller.py:83) and compare probs."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nanocaller_tpu.models import IndelModel, load_model

    params, _ = load_model("indel", model_name)
    xs = np.stack(star_tensors).astype(np.float32)
    xp = np.stack(prog_tensors).astype(np.float32)

    def probs(x):
        x3 = np.concatenate([x, x, x], axis=1)  # (B,15,128,2)
        return np.asarray(jax.jit(IndelModel().apply)(params, x3))

    ps, pp = probs(xs), probs(xp)
    return {
        "argmax_equal": float((ps.argmax(1) == pp.argmax(1)).mean()),
        "prob_linf_mean": float(np.abs(ps - pp).max(axis=1).mean()),
        "prob_linf_p99": float(np.quantile(np.abs(ps - pp).max(axis=1),
                                           0.99)),
    }


def report(stats, label=""):
    n = max(stats["n"], 1)
    linf = np.array(stats["tensor_linf"]) if stats["tensor_linf"] else \
        np.zeros(1)
    print(f"\n== divergence {label} (n={stats['n']}) ==")
    print(f"consensus star==prog : {stats['cns_equal']/n:.4f}")
    print(f"consensus star==true : {stats['star_cns_true']/n:.4f}")
    print(f"consensus prog==true : {stats['prog_cns_true']/n:.4f}")
    print(f"allele   star==prog  : {stats['allele_equal']/n:.4f}")
    print(f"tensor Linf mean/p99 : {linf.mean():.4f} / "
          f"{np.quantile(linf, 0.99):.4f}")
    if "model" in stats:
        m = stats["model"]
        print(f"model argmax equal   : {m['argmax_equal']:.4f}  "
              f"prob Linf mean {m['prob_linf_mean']:.4f} "
              f"p99 {m['prob_linf_p99']:.4f}")
    print(f"{'category':>8} {'n':>5} {'cns=':>6} {'allele=':>8} "
          f"{'star_true':>9} {'prog_true':>9}")
    for cat, c in sorted(stats["per_cat"].items()):
        cn = max(c["n"], 1)
        print(f"{cat:>8} {c['n']:>5} {c['cns_equal']/cn:>6.3f} "
              f"{c['allele_equal']/cn:>8.3f} {c['star_cns_true']/cn:>9.3f} "
              f"{c['prog_cns_true']/cn:>9.3f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=2000)
    ap.add_argument("--depth", type=int, default=25)
    ap.add_argument("--length", type=int, default=160)
    ap.add_argument("--sub_rate", type=float, default=0.05)
    ap.add_argument("--indel_rate", type=float, default=0.04)
    ap.add_argument("--hp_slip", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sweep", action="store_true",
                    help="gap-parameter sensitivity grid for the oracle")
    ap.add_argument("--model", default=None,
                    help="indel model pack for model-level divergence")
    ap.add_argument("--final", action="store_true",
                    help="final-call mode: 3 MSAs + CNN + decode tree")
    args = ap.parse_args()

    if args.final:
        stats = run_final_call_trials(
            args.trials, args.depth, args.length, args.sub_rate,
            args.indel_rate, args.hp_slip, args.seed,
            args.model or "ONT-HG002")
        report_final(stats)
        n = max(stats.get("n", 0), 1)
        print(json.dumps({
            "mode": "final_call", "n": stats.get("n", 0),
            "call_concordance": stats["call_equal"] / n,
            "star_true": stats["star_true"] / n,
            "prog_true": stats["prog_true"] / n,
            "argmax_equal": stats["argmax_equal"] / n,
            "config": {k: getattr(args, k) for k in
                       ("trials", "depth", "length", "sub_rate",
                        "indel_rate", "hp_slip", "seed")},
        }))
        return

    if args.sweep:
        out = {}
        for go in (0, 1, 2, 4):
            for ge in (1, 2):
                stats = run_trials(args.trials, args.depth, args.length,
                                   args.sub_rate, args.indel_rate,
                                   args.hp_slip, args.seed, gap_open=go,
                                   gap_extend=ge, progress=False)
                key = f"open={go},ext={ge}"
                report(stats, key)
                out[key] = {"allele_equal": stats["allele_equal"] /
                            max(stats["n"], 1),
                            "cns_equal": stats["cns_equal"] /
                            max(stats["n"], 1)}
        print(json.dumps({"sweep": out}))
        return

    stats = run_trials(args.trials, args.depth, args.length, args.sub_rate,
                       args.indel_rate, args.hp_slip, args.seed,
                       model=args.model)
    report(stats)
    n = max(stats["n"], 1)
    linf = np.array(stats["tensor_linf"]) if stats["tensor_linf"] else \
        np.zeros(1)
    summary = {
        "n": stats["n"],
        "allele_concordance": stats["allele_equal"] / n,
        "cns_concordance": stats["cns_equal"] / n,
        "star_cns_true": stats["star_cns_true"] / n,
        "prog_cns_true": stats["prog_cns_true"] / n,
        "tensor_linf_mean": float(linf.mean()),
        "model": stats.get("model"),
        "config": {k: getattr(args, k) for k in
                   ("trials", "depth", "length", "sub_rate", "indel_rate",
                    "hp_slip", "seed")},
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
