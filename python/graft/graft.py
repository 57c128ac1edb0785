"""Python client library for a graft lake service.

Speaks the service's REST surface (POST /pool, /pool/<p>/branch/<b>,
/query) over the standard library's urllib, and decodes
application/x-zjson responses into native Python values (ints, floats,
datetimes, timedeltas, ip addresses, sets, dicts, ...).

The zjson decoder compiles each type definition the stream announces
into a converter closure once, then applies that closure to every value
carrying the type — rather than re-walking the type tree per record.
"""

import binascii
import datetime
import decimal
import ipaddress
import json
import os
import re
import urllib.error
import urllib.parse
import urllib.request

__all__ = [
    'Client', 'RequestError', 'QueryError',
    'decode_zjson', 'parse_duration', 'parse_time',
]

_ENV_URL = 'GRAFT_LAKE'
_ENV_TOKEN = 'GRAFT_TOKEN'
_DEFAULT_URL = 'http://localhost:9867'
_DEFAULT_LAYOUT = {'order': 'desc', 'keys': [['ts']]}


class RequestError(Exception):
    """An HTTP request to the service failed."""

    def __init__(self, message, status=None, response=None):
        super().__init__(message)
        self.status = status
        self.response = response


class QueryError(Exception):
    """The service reported a query failure in the response stream."""


def _bearer_token(base_url, config_dir):
    """Locate a bearer token for base_url.

    $GRAFT_TOKEN wins; otherwise look for a per-service entry in
    <config_dir>/credentials.json. Returns None when unauthenticated.
    """
    token = os.environ.get(_ENV_TOKEN)
    if token:
        return token
    directory = config_dir or os.path.expanduser('~/.graft')
    path = os.path.join(directory, 'credentials.json')
    if not os.path.exists(path):
        return None
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except (OSError, ValueError):
        return None
    entry = doc.get('services', {}).get(base_url)
    if isinstance(entry, dict):
        return entry.get('access')
    return None


def _http_error_message(err):
    """Best error text out of an HTTPError: the service's JSON 'error'
    field when present, the raw body otherwise."""
    body = err.read()
    try:
        return json.loads(body)['error']
    except Exception:
        return body.decode('utf-8', 'replace') or str(err)


class Client:
    """A connection to one graft lake service."""

    def __init__(self, base_url=None, config_dir=None):
        if base_url is None:
            base_url = os.environ.get(_ENV_URL, _DEFAULT_URL)
        self.base_url = base_url.rstrip('/')
        self._token = _bearer_token(self.base_url, config_dir)

    def _post(self, path, body, content_type, extra_headers=None):
        headers = {
            'Accept': 'application/x-zjson',
            'Content-Type': content_type,
        }
        if self._token:
            headers['Authorization'] = 'Bearer ' + self._token
        if extra_headers:
            headers.update(extra_headers)
        if isinstance(body, str):
            body = body.encode('utf-8')
        request = urllib.request.Request(
            self.base_url + path, data=body, headers=headers, method='POST')
        try:
            return urllib.request.urlopen(request)
        except urllib.error.HTTPError as err:
            raise RequestError(_http_error_message(err), status=err.code,
                               response=err) from None

    def create_pool(self, name, layout=None, thresh=0):
        """Create a pool; layout defaults to ts-descending."""
        body = json.dumps({
            'name': name,
            'layout': _DEFAULT_LAYOUT if layout is None else layout,
            'thresh': thresh,
        })
        with self._post('/pool', body, 'application/json') as response:
            response.read()

    def load(self, pool, data, branch_name='main',
             commit_author=None, commit_body=''):
        """Commit ZSON text (or bytes in any self-describing format) to
        a pool branch."""
        if commit_author is None:
            commit_author = os.environ.get('USER') or 'graft-python'
        target = '/pool/{}/branch/{}'.format(
            urllib.parse.quote(pool, safe=''),
            urllib.parse.quote(branch_name, safe=''))
        commit = json.dumps({'author': commit_author, 'body': commit_body})
        with self._post(target, data, 'application/x-zson',
                        extra_headers={'Zed-Commit': commit}) as response:
            response.read()

    def query_raw(self, query, headers=None):
        """POST a query; return the raw HTTP response object."""
        return self._post('/query', json.dumps({'query': query}),
                          'application/json', extra_headers=headers)

    def query(self, query):
        """Run a query and yield decoded Python values."""
        response = self.query_raw(query)
        messages = (json.loads(line) for line in response if line.strip())
        return decode_zjson(messages)


# --------------------------------------------------------------------
# zjson decoding

_NS_PER = (
    ('y', 31536000 * 10**9), ('w', 7 * 86400 * 10**9), ('d', 86400 * 10**9),
    ('h', 3600 * 10**9), ('m', 60 * 10**9), ('s', 10**9),
    ('ms', 10**6), ('us', 10**3), ('µs', 10**3), ('ns', 1),
)
_DURATION_RE = re.compile(r'(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d|w|y)')


def parse_duration(text):
    """A zed duration literal ("1h2m3.5s", "-150ms") as a timedelta."""
    if text in ('0', '0s'):
        return datetime.timedelta(0)
    negative = text.startswith('-')
    if negative:
        text = text[1:]
    units = dict(_NS_PER)
    total_ns = sum(int(round(float(num) * units[unit]))
                   for num, unit in _DURATION_RE.findall(text))
    if negative:
        total_ns = -total_ns
    return datetime.timedelta(microseconds=total_ns / 1000)


def parse_time(text):
    """An RFC 3339 timestamp as an aware datetime (ns truncated to µs)."""
    text = text.replace('Z', '+00:00')
    overflow = re.match(r'(.*\.\d{6})\d+([+-].*)?$', text)
    if overflow:
        text = overflow.group(1) + (overflow.group(2) or '')
    return datetime.datetime.fromisoformat(text)


_PRIMITIVE_CONVERTERS = {
    'uint8': int, 'uint16': int, 'uint32': int, 'uint64': int,
    'int8': int, 'int16': int, 'int32': int, 'int64': int,
    'float16': float, 'float32': float, 'float64': float,
    'decimal': decimal.Decimal,
    'bool': 'true'.__eq__,
    'bytes': lambda text: binascii.a2b_hex(text[2:]),
    'string': str,
    'type': str,
    'ip': ipaddress.ip_address,
    'net': ipaddress.ip_network,
    'duration': parse_duration,
    'time': parse_time,
    'null': lambda text: None,
}


def _apply(converter, value):
    return None if value is None else converter(value)


def _compile_type(table, spec):
    """Compile a zjson type description into a converter closure and
    register it in `table` under the type's id (when it has one)."""
    kind = spec['kind']
    if kind == 'ref':
        return table[spec['id']]
    if kind == 'primitive':
        converter = _PRIMITIVE_CONVERTERS.get(spec['name'])
        if converter is None:
            raise ValueError('unknown zjson primitive: ' + spec['name'])
    elif kind == 'record':
        fields = [(f['name'], _compile_type(table, f['type']))
                  for f in spec['fields']]

        def converter(items, fields=fields):
            return {name: _apply(conv, item)
                    for (name, conv), item in zip(fields, items)}
    elif kind == 'array':
        inner = _compile_type(table, spec['type'])

        def converter(items, inner=inner):
            return [_apply(inner, item) for item in items]
    elif kind == 'set':
        inner = _compile_type(table, spec['type'])

        def converter(items, inner=inner):
            return {_apply(inner, item) for item in items}
    elif kind == 'map':
        key_conv = _compile_type(table, spec['key_type'])
        val_conv = _compile_type(table, spec['val_type'])

        def converter(entries, kc=key_conv, vc=val_conv):
            return {_apply(kc, key): _apply(vc, val)
                    for key, val in entries}
    elif kind == 'union':
        arms = [_compile_type(table, arm) for arm in spec['types']]

        def converter(tagged, arms=arms):
            return _apply(arms[int(tagged[0])], tagged[1])
    elif kind == 'enum':
        def converter(index, symbols=spec['symbols']):
            return symbols[int(index)]
    elif kind in ('error', 'named'):
        converter = _compile_type(table, spec['type'])
    else:
        raise ValueError('unknown zjson type kind: ' + kind)
    type_id = spec.get('id')
    if type_id is not None:
        table[type_id] = converter
    return converter


def decode_zjson(messages):
    """Yield Python values from an iterable of parsed zjson messages.

    Raises QueryError when the stream carries a QueryError control
    message.
    """
    table = {}
    for message in messages:
        spec = message.get('type')
        if isinstance(spec, dict):
            converter = _compile_type(table, spec)
            yield _apply(converter, message['value'])
        elif spec == 'QueryError':
            raise QueryError(message['value']['error'])


def _main(argv=None):
    import sys
    args = sys.argv[1:] if argv is None else argv
    if not args or args[0] in ('-h', '--help'):
        print('usage: python -m graft [-u BASE_URL] QUERY', file=sys.stderr)
        return 2
    url = None
    if args[0] == '-u':
        url, args = args[1], args[2:]
    client = Client(base_url=url)
    for record in client.query(' '.join(args)):
        print(record)
    return 0


if __name__ == '__main__':
    raise SystemExit(_main())
