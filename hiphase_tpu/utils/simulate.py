"""Fast vectorized WGS-scale dataset simulator for benchmarks.

Generates a reference FASTA, a bgzipped+indexed VCF of het/hom SNVs, and a
coordinate-sorted indexed BAM of HiFi-like reads (configurable length,
coverage, and sequencing-error rate) — the input shape of the reference's
published baseline run (HG001 WGS, local-only mode; ref:
docs/user_guide.md:60-82). Unlike tests/sim.py (tiny adversarial cases),
this generator is written to produce 100 Mb+ datasets in seconds: all
per-base work is numpy, records are assembled as raw BAM bytes in bulk.
"""

from __future__ import annotations

import struct

import numpy as np

from hiphase_tpu.io.bam import BamWriter, SamHeader, reg2bin
from hiphase_tpu.io.vcf import VcfHeader, VcfWriter

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

# base byte -> BAM 4-bit nibble (A=1 C=2 G=4 T=8, N=15)
_NIB = np.zeros(256, dtype=np.uint8)
_NIB[ord("A")] = 1
_NIB[ord("C")] = 2
_NIB[ord("G")] = 4
_NIB[ord("T")] = 8
_NIB[ord("N")] = 15


def pack_seq(seq: np.ndarray) -> bytes:
    """4-bit pack an ASCII base array (BAM §4.2.3)."""
    nib = _NIB[seq]
    if len(nib) % 2:
        nib = np.concatenate([nib, np.zeros(1, dtype=np.uint8)])
    return ((nib[0::2] << 4) | nib[1::2]).tobytes()


def simulate_chromosome(rng, length: int, het_spacing: int = 800,
                        hom_spacing: int = 2000):
    """Random sequence + non-overlapping het/hom SNVs at roughly human
    density (~1 het / 800 bp). Returns (seq uint8[L], pos, alt, is_het,
    phase) where phase[i] in {0,1} gives the haplotype carrying ALT for
    het sites."""
    seq = rng.choice(BASES, size=length)
    n_het = length // het_spacing
    n_hom = length // hom_spacing
    pos = rng.choice(np.arange(50, length - 50), size=n_het + n_hom,
                     replace=False)
    pos.sort()
    is_het = np.zeros(len(pos), dtype=bool)
    is_het[rng.permutation(len(pos))[:n_het]] = True
    # ALT differs from REF: add 1..3 in base space mod 4
    ref_idx = np.searchsorted(BASES, seq[pos])
    alt_idx = (ref_idx + rng.integers(1, 4, size=len(pos))) % 4
    alt = BASES[alt_idx]
    phase = rng.integers(0, 2, size=len(pos)).astype(np.int8)
    return seq, pos, alt, is_het, phase


def write_fasta_fast(path: str, names, seqs) -> None:
    with open(path, "wb") as fh:
        for name, seq in zip(names, seqs):
            fh.write(b">" + name.encode() + b"\n")
            n = len(seq)
            # 60-col wrap via one reshape-ish pass
            for i in range(0, n, 6_000_000):
                chunk = seq[i:i + 6_000_000]
                m = len(chunk)
                pad = (-m) % 60
                arr = np.concatenate(
                    [chunk, np.full(pad, ord("\n"), dtype=np.uint8)])
                arr = arr.reshape(-1, 60)
                out = np.concatenate(
                    [arr, np.full((arr.shape[0], 1), ord("\n"),
                                  dtype=np.uint8)], axis=1)
                data = out.tobytes()
                if pad:
                    data = data[:-(pad + 1)] + b"\n"
                fh.write(data)


def write_vcf_fast(path: str, names, chrom_variants, sample: str = "SAMPLE",
                   io_threads: int = 2) -> int:
    """chrom_variants: list of (pos, alt, is_het, phase, seq). Returns total
    het count."""
    lines = [b"##fileformat=VCFv4.2",
             b'##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
             b'##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Quality">']
    for name, (pos, alt, is_het, phase, seq) in zip(names, chrom_variants):
        lines.append(f"##contig=<ID={name},length={len(seq)}>".encode())
    cols = (b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + sample.encode())
    header = VcfHeader.parse(lines + [cols])
    wr = VcfWriter(path, header, io_threads=io_threads)
    from hiphase_tpu.io.vcf import VcfRecord
    n_het = 0
    for name, (pos, alt, is_het, phase, seq) in zip(names, chrom_variants):
        nameb = name.encode()
        refs = seq[pos]
        for i in range(len(pos)):
            gt = b"0/1" if is_het[i] else b"1/1"
            n_het += bool(is_het[i])
            wr.write(VcfRecord([
                nameb, b"%d" % (pos[i] + 1), b".", b"%c" % refs[i],
                b"%c" % alt[i], b"60", b"PASS", b".", b"GT:GQ",
                gt + b":60"]))
    wr.close()
    wr.write_index()
    return n_het


def make_read_raw(name: bytes, refid: int, pos: int, seq: np.ndarray,
                  qual: int, rg: bytes) -> bytes:
    """Assemble one all-M BAM record body (no leading block_size)."""
    L = len(seq)
    nameb = name + b"\x00"
    head = struct.pack("<iiBBHHHIiii", refid, pos, len(nameb), 60,
                       reg2bin(pos, pos + L), 1, 0, L, -1, -1, 0)
    cig = struct.pack("<I", (L << 4) | 0)  # <L>M
    return head + nameb + cig + pack_seq(seq) + bytes([qual]) * L + rg


def simulate_reads_fast(rng, seq, pos, alt, is_het, phase, refid: int,
                        read_length: int, coverage: int,
                        error_rate: float = 0.002):
    """Yield (start, raw_record) coordinate-sorted; all-M HiFi-like reads
    drawn from the two truth haplotypes with uniform mismatch errors."""
    length = len(seq)
    # two haplotype sequences
    hap0 = seq.copy()
    hap1 = seq.copy()
    het = is_het
    hom = ~is_het
    hap0[pos[hom]] = alt[hom]
    hap1[pos[hom]] = alt[hom]
    h0_mask = het & (phase == 0)
    h1_mask = het & (phase == 1)
    hap0[pos[h0_mask]] = alt[h0_mask]
    hap1[pos[h1_mask]] = alt[h1_mask]
    haps = (hap0, hap1)

    n_reads = max(1, coverage * length // read_length)
    starts = rng.integers(-read_length + 200, length - 200, size=n_reads)
    starts.sort()
    hap_of = rng.integers(0, 2, size=n_reads)
    for i in range(n_reads):
        s = max(0, int(starts[i]))
        e = min(length, int(starts[i]) + read_length)
        rseq = haps[hap_of[i]][s:e].copy()
        if error_rate > 0:
            n_err = rng.binomial(len(rseq), error_rate)
            if n_err:
                at = rng.integers(0, len(rseq), size=n_err)
                ref_idx = np.searchsorted(BASES, rseq[at])
                rseq[at] = BASES[(ref_idx + rng.integers(1, 4, n_err)) % 4]
        yield s, make_read_raw(b"m%d_%d" % (refid, i), refid, s, rseq,
                               30, b"RGZrg1\x00")


def build_benchmark_dataset(out_dir: str, total_mb: int = 100,
                            n_contigs: int = 4, coverage: int = 30,
                            read_length: int = 15_000, seed: int = 0,
                            het_spacing: int = 800, hom_spacing: int = 2000,
                            error_rate: float = 0.002, sample: str = "SAMPLE",
                            io_threads: int = 2):
    """Build fasta/vcf/bam under out_dir; returns dict of paths + counts."""
    import os

    from hiphase_tpu.io.bam import BamRecord

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    contig_len = total_mb * 1_000_000 // n_contigs
    names = [f"chr{i + 1}" for i in range(n_contigs)]
    fasta = os.path.join(out_dir, "ref.fa")
    vcf = os.path.join(out_dir, "calls.vcf.gz")
    bam = os.path.join(out_dir, "reads.bam")

    chrom_data = []
    for i in range(n_contigs):
        chrom_data.append(simulate_chromosome(rng, contig_len,
                                              het_spacing, hom_spacing))
    write_fasta_fast(fasta, names, [c[0] for c in chrom_data])
    n_het = write_vcf_fast(
        vcf, names,
        [(p, a, h, ph, s) for (s, p, a, h, ph) in chrom_data],
        sample=sample, io_threads=io_threads)

    header = SamHeader(
        "@HD\tVN:1.6\tSO:coordinate\n"
        f"@RG\tID:rg1\tSM:{sample}\n",
        names, [contig_len] * n_contigs)
    w = BamWriter(bam, header, io_threads=io_threads)
    n_reads = 0
    for refid, (seq, pos, alt, is_het, phase) in enumerate(chrom_data):
        for _s, raw in simulate_reads_fast(rng, seq, pos, alt, is_het,
                                           phase, refid, read_length,
                                           coverage, error_rate):
            w.write(BamRecord.parse(raw))
            n_reads += 1
    w.close()
    w.write_index()
    return {"fasta": fasta, "vcf": vcf, "bam": bam, "n_het": n_het,
            "n_reads": n_reads, "total_bp": contig_len * n_contigs}
