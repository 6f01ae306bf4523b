"""Multi-host execution: a REAL 2-process `jax.distributed.initialize` run
of the TPU engine whose host-0 output must byte-equal the single-process
run (SURVEY.md §2.9/§5.8 — the distributed-backend obligation)."""

import socket
import subprocess
import sys
import textwrap

from hiphase_tpu.io.vcf import VcfReader

from tests.sim import build_dataset
from tests.test_e2e import run_cli

REPO = "/root/repo"

DRIVER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize({coord!r}, 2, int(sys.argv[1]))
    from hiphase_tpu.cli import main
    rc = main(["--bam", {bam!r}, "--vcf", {vcf!r}, "--reference", {fasta!r},
               "--output-vcf", {out!r}, "--engine", "tpu",
               "--beam-width", "64", "--batch-size", "4"])
    sys.exit(rc)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_run_matches_single(tmp_path):
    fasta, vcf, bam, _contigs, _ = build_dataset(
        tmp_path, seed=31, n_contigs=4, contig_len=6000, coverage=15)

    vcf_single, _ = run_cli(tmp_path, fasta, vcf, bam, name="single",
                            extra=["--engine", "tpu", "--beam-width", "64",
                                   "--batch-size", "4"])

    out = str(tmp_path / "multi.vcf.gz")
    coord = f"127.0.0.1:{_free_port()}"
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER.format(repo=REPO, coord=coord, bam=bam, vcf=vcf,
                                    fasta=fasta, out=out))
    procs = [subprocess.Popen([sys.executable, str(driver), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, so, se))
    for rc, so, se in outs:
        assert rc == 0, se.decode()[-2000:]

    a = [r.serialize() for r in VcfReader(vcf_single)]
    b = [r.serialize() for r in VcfReader(out)]
    assert a == b
