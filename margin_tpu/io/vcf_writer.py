"""Phased-VCF writer + phaseset BED.

Parity: writePhasedVcf (vcf.c:679-1079), updateHaplotypeSwitchingInVcfEntries
(vcf.c:595-650). The original VCF is re-streamed; GT is rewritten
(phased `a|b` or unphased) and a PS FORMAT field appended for phased hets —
matching htslib's bcf_update_genotypes/bcf_update_format_int32 output
for the updateAllOutputVCFFormatFields=false path (the shipped configs).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

from margin_tpu.io.vcf import VcfEntry, parse_region, _open_text
from margin_tpu.params import Params


def binomial_pvalue(n: int, k: int) -> float:
    """binomialPValue (bubbleGraph.c:2876-2883): two... one-sided tail
    P(X >= max(k, n-k)) under Binomial(n, 1/2)."""
    if n == 0:
        return 1.0
    k = n - k if k < n / 2 else k
    total = 0
    for i in range(k, n + 1):
        total += math.comb(n, i)
    return total / (2.0 ** n)


def update_haplotype_switching(chunks, switched: List[bool],
                               vcf_entry_map: Dict[str, List[VcfEntry]]):
    """updateHaplotypeSwitchingInVcfEntries (vcf.c:595-650): flip phased
    genotypes of entries in chunks whose phase was switched at stitch."""
    import bisect
    cur_contig = None
    entries = None
    idx = 0
    for i, chunk in enumerate(chunks):
        if cur_contig is None or cur_contig != chunk.ref_name:
            cur_contig = chunk.ref_name
            entries = vcf_entry_map.get(cur_contig)
            if entries is None:
                cur_contig = None
                continue
            positions = [e.ref_pos for e in entries]
            idx = bisect.bisect_left(positions, chunk.chunk_start)
        while idx < len(entries) and entries[idx].ref_pos < chunk.chunk_end:
            e = entries[idx]
            if e.ref_pos >= chunk.chunk_start and switched[i]:
                e.phased_gt1, e.phased_gt2 = e.phased_gt2, e.phased_gt1
                e.haplotype1_prob, e.haplotype2_prob = (e.haplotype2_prob,
                                                        e.haplotype1_prob)
            idx += 1


def _set_gt(parts: List[str], gt_value: str, add_ps: Optional[int]):
    """Rewrite the GT subfield of the first sample; optionally append PS."""
    if len(parts) < 10:
        return parts
    fmt = parts[8].split(":")
    sample = parts[9].split(":")
    while len(sample) < len(fmt):
        sample.append(".")
    if "GT" in fmt:
        sample[fmt.index("GT")] = gt_value
    else:
        fmt.insert(0, "GT")
        sample.insert(0, gt_value)
    if add_ps is not None:
        if "PS" in fmt:
            sample[fmt.index("PS")] = str(add_ps)
        else:
            fmt.append("PS")
            sample.append(str(add_ps))
    parts[8] = ":".join(fmt)
    parts[9] = ":".join(sample)
    return parts


def _unphased_gt(gt1: int, gt2: int) -> str:
    a = "." if gt1 < 0 else str(gt1)
    b = "." if gt2 < 0 else str(gt2)
    return f"{a}/{b}"


def write_phased_vcf(input_vcf: str, region: Optional[str], output_vcf: str,
                     phaseset_bed: Optional[str],
                     vcf_entry_map: Dict[str, List[VcfEntry]], params: Params):
    """writePhasedVcf (vcf.c:679-1079), updateAllOutputVCFFormatFields=false
    path."""
    pp = params.phase
    region_contig, region_start, region_end = parse_region(region)

    out = open(output_vcf, "w")
    bed = open(phaseset_bed, "w") if phaseset_bed else None

    header_written = False
    prev_het: Optional[VcfEntry] = None
    cur_entry: Optional[VcfEntry] = None
    phase_set = -1
    next_idx = 0
    cur_chrom = None
    cur_entries: List[VcfEntry] = []
    phase_set_lengths: List[int] = []

    def record_phase_set(reason: str):
        nonlocal phase_set
        if phase_set != -1 and prev_het is not None:
            phase_set_lengths.append(prev_het.ref_pos - phase_set)
            if bed is not None:
                bed.write(f"{prev_het.ref_name}\t{phase_set}\t{prev_het.ref_pos}\t{reason}\n")

    header_lines: List[str] = []
    for line in _open_text(input_vcf):
        if line.startswith("##"):
            header_lines.append(line)
            continue
        if line.startswith("#"):
            # append FORMAT headers (vcf.c:723-724) then the column line
            header_lines.append('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">')
            header_lines.append('##FORMAT=<ID=PS,Number=1,Type=Integer,Description="Phase Set Identifier">')
            seen = set()
            for hl in header_lines:
                key = hl.split(",")[0] if hl.startswith("##FORMAT") else hl
                if key in seen:
                    continue
                seen.add(key)
                out.write(hl + "\n")
            out.write(line + "\n")
            header_written = True
            continue
        if not line.strip():
            continue
        parts = line.split("\t")
        chrom, pos = parts[0], int(parts[1]) - 1
        if region_contig is not None and (chrom != region_contig or
                                          (region_start >= 0 and not (region_start <= pos < region_end))):
            continue

        # original genotype
        orig_gt1 = orig_gt2 = -1
        if len(parts) >= 10:
            fmt = parts[8].split(":")
            sample = parts[9].split(":")
            if "GT" in fmt:
                g = sample[fmt.index("GT")]
                sep = "|" if "|" in g else "/"
                f = g.split(sep)
                if len(f) >= 2 and f[0] not in (".", ""):
                    try:
                        orig_gt1, orig_gt2 = int(f[0]), int(f[1])
                    except ValueError:
                        pass

        skipped = False
        if pp.onlyUsePassVCFEntries and parts[6] not in ("PASS", "."):
            skipped = True
        if not pp.includeHomozygousVCFEntries and orig_gt1 == orig_gt2:
            skipped = True
        if skipped:
            out.write("\t".join(_set_gt(parts, _unphased_gt(orig_gt1, orig_gt2), None)) + "\n")
            continue

        if cur_chrom is None or cur_chrom != chrom:
            record_phase_set("ContigEnd\t")
            cur_chrom = chrom
            cur_entries = vcf_entry_map.get(chrom, [])
            prev_het = None
            cur_entry = None
            next_idx = 0
            phase_set = -1

        # locate the matching entry (vcf.c:820-845)
        next_entry = None
        while next_idx < len(cur_entries):
            cand = cur_entries[next_idx]
            if cand.ref_pos == pos:
                next_idx += 1
                next_entry = cand
                break
            elif cand.ref_pos > pos:
                next_entry = None
                break
            next_idx += 1
        if next_entry is None or not next_entry.was_updated:
            out.write("\t".join(_set_gt(parts, _unphased_gt(orig_gt1, orig_gt2), None)) + "\n")
            continue

        if cur_entry is not None and cur_entry.phased_gt1 != cur_entry.phased_gt2:
            prev_het = cur_entry
        cur_entry = next_entry

        gt1, gt2 = cur_entry.phased_gt1, cur_entry.phased_gt2

        # concordance with previous het (vcf.c:895-911)
        hcpv1 = hcpv2 = hdpv1 = hdpv2 = -1
        determined = False
        if (prev_het is not None and gt1 != gt2 and prev_het.phased_gt1 >= 0
                and gt1 >= 0):
            prev_h1 = prev_het.allele_idx_to_read_ids[prev_het.phased_gt1]
            prev_h2 = prev_het.allele_idx_to_read_ids[prev_het.phased_gt2]
            cur_h1 = cur_entry.allele_idx_to_read_ids[gt1]
            cur_h2 = cur_entry.allele_idx_to_read_ids[gt2]
            hcpv1 = len(prev_h1 & cur_h1)
            hcpv2 = len(prev_h2 & cur_h2)
            hdpv1 = len(prev_h2 & cur_h1)
            hdpv2 = len(prev_h1 & cur_h2)
            determined = True

        # phase set boundary decision (vcf.c:913-945)
        new_phase_set = False
        reason = None
        if gt1 != gt2 and prev_het is None:
            new_phase_set = True
            reason = "NoHet\t"
        elif determined:
            if hcpv1 + hcpv2 < pp.phasesetMinSpanningReads:
                new_phase_set = True
                reason = f"MissingConcordancy\tH1-{hcpv1}_H2-{hcpv2}"
            elif binomial_pvalue(hcpv1 + hcpv2, hcpv1) < pp.phasesetMinBinomialReadSplitLikelihood:
                new_phase_set = True
                pv = binomial_pvalue(hcpv1 + hcpv2, hcpv1)
                reason = f"UnlikelyConcordancy\tH1-{hcpv1}_H2-{hcpv2}_Prob-{pv:.8f}"
            elif (hcpv1 + hcpv2 + hdpv1 + hdpv2) > 0 and \
                    (hdpv1 + hdpv2) / (hcpv1 + hcpv2 + hdpv1 + hdpv2) > pp.phasesetMaxDiscordantRatio:
                new_phase_set = True
                ratio = (hdpv1 + hdpv2) / (hcpv1 + hcpv2 + hdpv1 + hdpv2)
                reason = f"Discordancy\tH1D-{hcpv1}_H2D-{hcpv2}_H1C-{hdpv1}_H2C-{hdpv2}_ratio-{ratio:.4f}"
        if new_phase_set:
            record_phase_set(reason)
            phase_set = pos

        write_ps = gt1 != gt2
        # only trust phasing matching the original call (vcf.c:989-1008)
        if not ((gt1 == orig_gt1 and gt2 == orig_gt2)
                or (gt1 == orig_gt2 and gt2 == orig_gt1)):
            write_ps = False
        if write_ps:
            parts = _set_gt(parts, f"{gt1}|{gt2}", phase_set)
        else:
            parts = _set_gt(parts, _unphased_gt(orig_gt1, orig_gt2), None)
        out.write("\t".join(parts) + "\n")

    record_phase_set("ContigEnd\t")
    out.close()
    if bed is not None:
        bed.close()
    assert header_written, "input VCF had no header"
    return phase_set_lengths
