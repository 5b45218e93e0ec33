from .transfer import PointEvalTransfer, injection, prolongation
