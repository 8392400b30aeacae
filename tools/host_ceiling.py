"""Host CPU-scaling ceiling calibration: the same taskset pinning as
scalebench, but a pure-CPU busy loop — measures what 2->8-core scaling the
box itself can show with NO memory traffic. Run adjacent to a scaling
benchmark so its efficiency can be read against the host's own ceiling.

Usage: python tools/host_ceiling.py [trials]
"""
import subprocess
import sys
import tempfile

BURN = '''
import sys, time, multiprocessing as mp
def burn(q, secs):
    t_end = time.monotonic() + secs
    x = 0; n = 0
    while time.monotonic() < t_end:
        for _ in range(10000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 1
    q.put(n)
if __name__ == "__main__":
    procs = int(sys.argv[1]); secs = float(sys.argv[2])
    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q, secs)) for _ in range(procs)]
    for p in ps: p.start()
    print(sum(q.get() for _ in ps))
    for p in ps: p.join()
'''


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(BURN)
        path = f.name
    effs = []
    for t in range(trials):
        n2 = int(subprocess.check_output(
            ["taskset", "-c", "0,1", sys.executable, path, "2", "5"]))
        n8 = int(subprocess.check_output(
            ["taskset", "-c", "0-7", sys.executable, path, "8", "5"]))
        eff = round(n8 / n2 / 4, 3)
        effs.append(eff)
        print(f"trial {t + 1}: 2c={n2} 8c={n8} eff={eff}")
    effs.sort()
    print(f"ceiling efficiencies: {effs} (median {effs[len(effs) // 2]})")


if __name__ == "__main__":
    main()
