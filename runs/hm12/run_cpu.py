import sys, os
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from hlax.cli import main
main.main(["--f=runs/hm12/cfg.txt"])
