from sahara_tpu.cli.main import main
