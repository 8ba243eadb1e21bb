# Container for dis_project_tpu (the role of the reference's dockerfile:
# a reproducible environment for the full pipeline).
#
#   docker build -t dis-project-tpu .
#   docker run --rm -it dis-project-tpu \
#       python -m dis_project_tpu.main --data-source synthetic
#
# The base image carries CPU jax; for Cloud TPU VMs install the libtpu
# wheel instead: pip install 'jax[tpu]' -f \
#   https://storage.googleapis.com/jax-releases/libtpu_releases.html

FROM python:3.12-slim

WORKDIR /app

COPY pyproject.toml README.md ./
COPY dis_project_tpu ./dis_project_tpu
COPY examples ./examples
COPY bench.py ./

RUN pip install --no-cache-dir \
    "jax>=0.4.30" numpy scipy optax orbax-checkpoint matplotlib tabulate \
    && pip install --no-cache-dir --no-deps -e .

CMD ["python", "-m", "dis_project_tpu.main", "--help"]
