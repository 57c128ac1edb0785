import setuptools

setuptools.setup(
    name='graft-client',
    version='0.1.0',
    description='Python client for the graft lake service',
    py_modules=['graft'],
    python_requires='>=3.8',
)
