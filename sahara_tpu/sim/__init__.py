from sahara_tpu.sim.read_simulator import Transcript, simulate_reads
