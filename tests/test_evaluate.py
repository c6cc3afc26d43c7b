import numpy as np
import pytest

from haploconduct_tpu.utils.simulate import mutate_sequence, random_genome
from haploconduct_tpu.workflows.evaluate import (
    AssemblyMetrics, evaluate_assembly, n50, polymorphic_position_accuracy)
from haploconduct_tpu.workflows.phasing_bench import (
    hpop_input_vcf, phased_vcf_to_contigs, sdhap_to_phased_vcf)


def test_n50():
    assert n50([]) == 0
    assert n50([100]) == 100
    assert n50([50, 40, 30, 20, 10]) == 40  # 90/150 >= half at 40


def test_evaluate_assembly_perfect():
    rng = np.random.default_rng(0)
    hap = random_genome(rng, 4000)
    contigs = [hap[0:1500], hap[1400:2900], hap[2800:4000]]
    m = evaluate_assembly(contigs, [hap])
    assert m.n_contigs == 3
    assert m.genome_fraction == 1.0
    assert m.mismatch_rate == 0.0
    assert m.unaligned_contigs == 0
    assert m.n50 == 1500


def test_evaluate_assembly_mismatches():
    rng = np.random.default_rng(1)
    hap = random_genome(rng, 3000)
    bad = mutate_sequence(hap[500:1500], rng, sub_rate=0.01)
    m = evaluate_assembly([bad], [hap])
    assert 0.005 < m.mismatch_rate < 0.02
    assert 0.3 < m.genome_fraction < 0.4


def test_quast_style_metrics():
    """NGA50 / duplication ratio / misassembly events (QUAST definitions)."""
    from haploconduct_tpu.core.reads import revcomp_str

    rng = np.random.default_rng(7)
    hap = random_genome(rng, 8000)

    # clean assembly: no misassemblies, duplication 1.0, NGA50 = block len
    clean = [hap[0:4000], hap[4000:8000]]
    m = evaluate_assembly(clean, [hap])
    assert m.misassemblies == 0
    assert m.duplication_ratio == pytest.approx(1.0)
    assert m.nga50 == 4000

    # duplicated contig: duplication ratio ~2 over the covered region
    m = evaluate_assembly([hap[0:3000], hap[0:3000]], [hap])
    assert m.duplication_ratio == pytest.approx(2.0)

    # relocation: two distant 2kb pieces glued together
    reloc = hap[0:2000] + hap[5000:7000]
    m = evaluate_assembly([reloc], [hap])
    assert m.misassemblies == 1

    # inversion: forward piece + reverse-complemented adjacent piece
    inv = hap[0:2000] + revcomp_str(hap[2000:4000])
    m = evaluate_assembly([inv], [hap])
    assert m.misassemblies >= 1

    # translocation: pieces of two different haplotypes
    hap2 = random_genome(np.random.default_rng(8), 8000)
    trans = hap[0:2000] + hap2[3000:5000]
    m = evaluate_assembly([trans], [hap, hap2])
    assert m.misassemblies == 1


def test_snp_recovery():
    rng = np.random.default_rng(2)
    h1 = random_genome(rng, 2000)
    h2 = mutate_sequence(h1, rng, sub_rate=0.01)
    # perfect assembly of both haplotypes -> all SNPs recovered
    rec, total = polymorphic_position_accuracy([h1, h2], [h1, h2])
    assert rec == total
    # only one haplotype assembled -> about half
    rec1, _ = polymorphic_position_accuracy([h1], [h1, h2])
    assert rec1 == total // 2


VCF_HEADER = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"


def test_hpop_input_vcf():
    lines = [
        "##fileformat=VCFv4.2\n", VCF_HEADER,
        "chr1\t100\t.\tA\tT\t50\tPASS\t.\tGT:DP\t0/1:30\n",
        "chr1\t200\t.\tG\tC\t50\tPASS\t.\tGT:DP\t1/1:25\n",  # homozygous
    ]
    out = hpop_input_vcf(lines)
    assert len(out) == 3  # 2 header + 1 het call
    assert out[2].split("\t")[8:] == ["GT", "0/1\n"]


def test_sdhap_roundtrip_and_contigs():
    vcf_lines = [
        "##fileformat=VCFv4.2\n", VCF_HEADER,
        "chr1\t5\t.\tA\tT\t50\tPASS\t.\tGT\t0/1\n",
        "chr1\t10\t.\tG\tC\t50\tPASS\t.\tGT\t0/1\n",
    ]
    phased = ["BLOCK 1\n", "1\t0\t1\n", "2\t1\t0\n", "****\n"]
    out = sdhap_to_phased_vcf(phased, vcf_lines, fmt="hpop")
    body = [l for l in out if not l.startswith("#")]
    assert body[0].split("\t")[9].startswith("0|1")
    assert body[1].split("\t")[9].startswith("1|0")

    ref = "AAAAAAAAAGGGGGGGGGG"  # A at pos 5, G at pos 10
    contigs = phased_vcf_to_contigs(out, ref, "chr1")
    seqs = dict(contigs)
    # hap1: ref at 5 (A), alt at 10 (C); hap2: T at 5, G at 10
    joined_h1 = "".join(s for i, s in contigs if i.endswith("h1"))
    joined_h2 = "".join(s for i, s in contigs if i.endswith("h2"))
    assert "C" in joined_h1 and "T" not in joined_h1
    assert "T" in joined_h2 and "C" not in joined_h2
